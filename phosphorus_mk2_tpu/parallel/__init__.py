"""SPMD parallelism: device meshes, wavefront sharding, film gather."""
