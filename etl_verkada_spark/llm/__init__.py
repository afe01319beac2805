"""LLM-data-pipeline operators (SURVEY.md §2.11, BASELINE.json mandate)."""
