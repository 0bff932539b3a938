"""Conversions, RNG, profiling utilities."""
