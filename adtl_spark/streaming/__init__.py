"""Structured Streaming extensions (the reference is strictly batch —
SURVEY.md §2.9; these are the engine's scale-path additions)."""
