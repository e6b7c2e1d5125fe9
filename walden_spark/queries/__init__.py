"""Registered query corpus covering SURVEY.md §2 (relational surface)."""
