"""Acceleration structures: MT intersection, SAH BVH build, traversal."""
