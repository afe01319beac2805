"""Relational operator families (SURVEY.md §2.1–§2.7)."""
