#!/usr/bin/env python3
"""Regenerate tests/data/mini_beir_frozen.json.

Runs the hybrid harness on the checked-in mini BEIR fixture under the
EXACT test conditions (CPU backend, x64 — mirror of tests/conftest.py)
and freezes every method's NDCG@5. tests/test_benchmarks.py::
TestMiniBeirFrozenScores asserts these at 1e-6; regenerate only for a
deliberate quality-affecting change, and say why in the commit message.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.chdir(ROOT)

from benchmarks.hybrid_beir import run_dataset  # noqa: E402
from benchmarks.utils import load_beir_dataset  # noqa: E402


def main():
    ds = load_beir_dataset(os.path.join(ROOT, "benchmarks/data/mini_beir"))
    res = run_dataset(ds, k=5, R=50, verbose=False)
    frozen = {m: v["ndcg@5"] for m, v in sorted(res.items())}
    out = os.path.join(ROOT, "tests/data/mini_beir_frozen.json")
    with open(out, "w") as f:
        json.dump(frozen, f, indent=1, sort_keys=True)
    print(f"froze {len(frozen)} methods -> {out}")


if __name__ == "__main__":
    main()
