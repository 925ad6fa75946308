"""Vectorized numpy kernels shared by operators and sketches."""
