"""Structured Streaming extension: windows, watermarks, stateful
operators, sinks (SURVEY §7.1 M5 — beyond the batch-only reference)."""
