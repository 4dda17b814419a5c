"""Datasets, feature loaders, and the simulated user."""
