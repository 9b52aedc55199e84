"""Structured Streaming layer (SURVEY §2.13 — forward-looking extension)."""
