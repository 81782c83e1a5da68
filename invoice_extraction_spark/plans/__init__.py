"""Physical-plan inspection helpers (scale hygiene checks)."""
