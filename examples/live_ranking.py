"""Live ranking: interleave retrieval with online feedback updates."""

import numpy as np

from bayesian_bm25_tpu import BayesianBM25Scorer

corpus = [
    "introduction to machine learning algorithms".split(),
    "machine learning for beginners with python".split(),
    "advanced machine learning research papers".split(),
    "cooking recipes for busy weeknights".split(),
    "learning to cook italian food".split(),
    "python snake care and feeding guide".split(),
]

scorer = BayesianBM25Scorer()
scorer.index(corpus, show_progress=False)
transform = scorer.transform
query = "machine learning python".split()

rng = np.random.default_rng(1)
# Simulated user: clicks doc 1 (beginner tutorial), skips others.
preferences = {1: 1.0, 0: 0.4, 2: 0.2, 4: 0.05, 5: 0.05}

for round_no in range(1, 4):
    ids, probs = scorer.retrieve([query], k=4)
    print(f"round {round_no}: ranking {ids[0].tolist()} "
          f"probs {np.round(probs[0], 3).tolist()}")
    scores = scorer.get_scores(query)
    for d in ids[0]:
        clicked = float(rng.uniform() < preferences.get(int(d), 0.0))
        transform.update(float(scores[d]), clicked, learning_rate=0.1)
    print(f"  after feedback: alpha={transform.alpha:.3f} "
          f"beta={transform.beta:.3f}")

print("\nThe transform's parameters shift with click feedback while the "
      "BM25 index stays fixed — re-ranking adapts without re-indexing.")
