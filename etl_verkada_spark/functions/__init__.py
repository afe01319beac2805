"""Scalar function families (SURVEY.md §2.8)."""
