"""Event-time streaming operators (SURVEY.md §2.9)."""
