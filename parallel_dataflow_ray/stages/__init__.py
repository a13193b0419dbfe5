"""Batch operators, Ray-Data-first: relational, windows, dedup, similarity."""
