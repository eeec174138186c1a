"""Fused jitted pipeline stages: calibration (EVM locate), measurement,
BPM estimation, and whole-clip scan fast paths."""
