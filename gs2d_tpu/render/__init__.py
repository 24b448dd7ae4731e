"""Renderer bridge and viewer."""
