"""Structured Streaming extensions (SURVEY §2.2 streaming row; §7 step 8)."""
