"""Multi-field (title + body) search with weighted log-odds fusion."""

from bayesian_bm25_tpu import MultiFieldScorer

documents = [
    {"title": "python programming guide".split(),
     "body": "learn to write clean python code with examples".split()},
    {"title": "cooking italian pasta".split(),
     "body": "fresh ingredients make the best pasta dishes".split()},
    {"title": "machine learning basics".split(),
     "body": "python is a popular language for machine learning".split()},
    {"title": "garden design ideas".split(),
     "body": "plan your garden with paths and flower beds".split()},
]

scorer = MultiFieldScorer(
    ["title", "body"], field_weights={"title": 0.7, "body": 0.3},
    base_rate="auto",
)
scorer.index(documents, show_progress=False)

for query in ("python".split(), "pasta ingredients".split()):
    ids, probs = scorer.retrieve(query, k=2)
    print(f"query: {' '.join(query)}")
    for d, p in zip(ids, probs):
        print(f"  doc {d} (P={p:.4f}): {' '.join(documents[d]['title'])}")
    print()

print("Title weight dominates: 'python' ranks the title match first even")
print("though doc 2's body also mentions python.")
