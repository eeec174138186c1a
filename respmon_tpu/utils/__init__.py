"""Host-side utilities: profiling, bounding boxes, logging helpers."""
