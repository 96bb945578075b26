"""Checkpoint and media IO: torch->JAX weight conversion, Orbax state."""
