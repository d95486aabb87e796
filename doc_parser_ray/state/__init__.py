"""Checkpoint / lineage / resume state management."""
