"""Shared utilities: metrics, checkpointing, logging."""
