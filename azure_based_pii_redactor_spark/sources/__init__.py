"""Synthetic sources (deterministic, seeded -- no external data)."""
