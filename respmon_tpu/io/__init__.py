"""Host-side I/O: capture sources, synthetic generators, recording."""
