"""Utilities: profiling, logging, metrics."""
