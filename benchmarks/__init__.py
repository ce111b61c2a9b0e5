"""Benchmark and evaluation harness (reference: benchmarks/, SURVEY §2.2).

Runnable experiments over local BEIR-format datasets or self-contained
synthetic IR datasets (the environment has no dataset/model egress; every
script runs end-to-end on synthetic data by default and picks up real
datasets from --data-dir when present).
"""
