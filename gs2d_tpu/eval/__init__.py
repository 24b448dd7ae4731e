"""Evaluation: image metrics and benchmark harnesses."""
