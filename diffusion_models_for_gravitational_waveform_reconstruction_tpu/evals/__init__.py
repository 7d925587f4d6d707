"""Evaluation harnesses: metrics, sampler sweeps, mass-grid heatmaps."""
