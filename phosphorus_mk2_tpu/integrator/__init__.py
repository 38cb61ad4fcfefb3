"""Integrators: the wavefront unidirectional path tracer."""
