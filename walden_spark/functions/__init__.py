"""Scalar/agg function helpers."""
