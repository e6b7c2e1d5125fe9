"""Structured Streaming extension (M5)."""
