"""Configs, metrics, logging, checkpointing."""
