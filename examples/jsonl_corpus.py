"""End-to-end JSONL corpus serving: the native data-loader path.

``BayesianBM25Scorer.index_jsonl`` parses a BEIR-format corpus.jsonl in
C++ (document bodies never materialize as Python strings), tokenizes and
builds the device index in native passes, and returns the corpus doc-id
strings so retrieval rows map back to dataset ids.
"""

import json
import os
import tempfile

import numpy as np

from bayesian_bm25_tpu import BayesianBM25Scorer


def main() -> None:
    docs = [
        {"_id": "mars-101", "title": "Mars basics",
         "text": "Mars is the fourth planet from the sun, a cold desert "
                 "world with a thin atmosphere."},
        {"_id": "rover-7", "title": "Rover missions",
         "text": "Robotic rovers explore the Martian surface, drilling "
                 "rocks and analyzing soil samples."},
        {"_id": "moon-3", "title": "Lunar geology",
         "text": "The moon's surface is covered in regolith formed by "
                 "meteorite impacts over billions of years."},
        {"_id": "venus-9", "title": "Venus climate",
         "text": "Venus has a runaway greenhouse atmosphere with surface "
                 "temperatures hot enough to melt lead."},
        {"_id": "probe-12", "title": "Deep space probes",
         "text": "Interplanetary probes send telemetry across millions "
                 "of kilometers back to earth stations."},
    ]

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "corpus.jsonl")
        with open(path, "w") as f:
            for row in docs:
                f.write(json.dumps(row) + "\n")

        scorer = BayesianBM25Scorer(method="lucene", base_rate="auto")
        doc_ids = scorer.index_jsonl(path)
        print(f"indexed {scorer.num_docs} documents from {path}")
        print(f"doc ids: {doc_ids}")

        for query in ("mars rover exploring the surface",
                      "hot atmosphere of venus"):
            ranked, probs = scorer.retrieve_texts([query], k=3)
            print(f"\nquery: {query!r}")
            for rank in range(ranked.shape[1]):
                row = int(np.asarray(ranked)[0, rank])
                p = float(np.asarray(probs)[0, rank])
                if p > 0:
                    print(f"  {doc_ids[row]:>10}  P(relevant) = {p:.3f}")


if __name__ == "__main__":
    main()
