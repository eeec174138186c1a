"""Numpy/cv2/scipy oracle models of the reference pipeline, for parity tests."""
