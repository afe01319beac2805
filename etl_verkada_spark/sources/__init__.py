"""Source connectors (reference S1/S2/S6/S7 patterns)."""
