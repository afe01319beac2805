"""The flagship reference pipeline (SURVEY.md §7.2)."""
