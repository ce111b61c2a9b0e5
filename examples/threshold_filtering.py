"""Absolute-threshold filtering: calibrated probabilities make a fixed
cutoff meaningful across queries."""

from bayesian_bm25_tpu import BayesianBM25Scorer

corpus = [
    "solar panels convert sunlight into electricity".split(),
    "wind turbines generate renewable energy".split(),
    "the history of medieval castles in europe".split(),
    "renewable energy sources reduce carbon emissions".split(),
    "castle architecture and defensive walls".split(),
    "battery storage for solar energy systems".split(),
]

scorer = BayesianBM25Scorer(base_rate=0.05)
scorer.index(corpus, show_progress=False)

THRESHOLD = 0.5
for query in ("renewable energy".split(), "castle".split(),
              "quantum computing".split()):
    probs = scorer.get_probabilities(query)
    kept = [(d, p) for d, p in enumerate(probs) if p >= THRESHOLD]
    print(f"query {' '.join(query)!r}: "
          f"{len(kept)} docs above P >= {THRESHOLD}")
    for d, p in sorted(kept, key=lambda x: -x[1]):
        print(f"  doc {d} (P={p:.3f}): {' '.join(corpus[d][:5])}...")
    if not kept:
        print("  (no confident matches — the calibrated threshold filters "
              "out weak hits instead of returning top-k noise)")
    print()
