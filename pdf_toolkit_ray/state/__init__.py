"""Checkpoint / manifest state for resumable runs."""
