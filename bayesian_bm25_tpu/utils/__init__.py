"""Observability: calibration metrics, fusion debugger, serialization."""
