"""Scalar/column function helpers: URL canonicalization, hashing, text stats."""
