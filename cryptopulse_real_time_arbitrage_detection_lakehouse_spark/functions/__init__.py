"""Engine scalar/aggregate function helpers (determinism, text, similarity)."""
