"""Index a corpus and retrieve calibrated probabilities."""

from bayesian_bm25_tpu import BayesianBM25Scorer

corpus = [
    "the quick brown fox jumps over the lazy dog".split(),
    "machine learning enables computers to learn from data".split(),
    "deep neural networks power modern artificial intelligence".split(),
    "the dog chased the cat through the garden".split(),
    "statistical learning theory underpins machine learning".split(),
    "gardens need water sunshine and healthy soil".split(),
]

scorer = BayesianBM25Scorer(base_rate="auto")
scorer.index(corpus, show_progress=False)
print(f"indexed {scorer.num_docs} docs, avgdl={scorer.avgdl:.1f}, "
      f"auto base_rate={scorer.base_rate:.3g}")
print(f"auto-estimated alpha={scorer.transform.alpha:.3f} "
      f"beta={scorer.transform.beta:.3f}")

queries = ["machine learning".split(), "dog garden".split()]
doc_ids, probs = scorer.retrieve(queries, k=3)
for q, ids, ps in zip(queries, doc_ids, probs):
    print(f"\nquery: {' '.join(q)}")
    for d, p in zip(ids, ps):
        snippet = " ".join(corpus[d][:6])
        print(f"  doc {d} (P={p:.4f}): {snippet}...")

print("\nDense probabilities for one query over all docs:")
dense = scorer.get_probabilities("learning data".split())
for d, p in enumerate(dense):
    print(f"  doc {d}: {p:.4f}")
