"""Stateful model wrappers reproducing the reference API surface."""
