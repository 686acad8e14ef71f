"""Placeholder — populated in a later batch."""
