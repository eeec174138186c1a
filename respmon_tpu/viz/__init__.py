"""Visualization backends (host-side, optional)."""
