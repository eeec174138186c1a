"""Version of respmon_tpu (reference exposes __version__ at __init__.py:1)."""

__version__ = "0.1.0"
