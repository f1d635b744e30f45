"""Utilities: torch checkpoint conversion, jax compile cache, stats."""
