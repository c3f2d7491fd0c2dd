"""Multimodal (binary) column plumbing — training-data-pipeline extension."""
