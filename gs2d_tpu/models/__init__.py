"""Gaussian surfel model state and densification."""
