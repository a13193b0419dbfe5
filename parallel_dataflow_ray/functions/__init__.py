"""Vectorized per-batch kernels: audio codecs, text analysis, hashing."""
