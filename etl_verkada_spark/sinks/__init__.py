"""Sink connectors (reference S8/S9/O4 patterns)."""
