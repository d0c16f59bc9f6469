"""Structured Streaming validation (SURVEY.md §2.7)."""
