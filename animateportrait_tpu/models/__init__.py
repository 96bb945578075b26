"""Flax model zoo for the talking-portrait framework."""
