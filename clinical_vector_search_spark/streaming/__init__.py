"""Structured Streaming extensions (no reference analog — SURVEY.md §2.8)."""
