"""Shared utilities: asset loading, config, logging."""
