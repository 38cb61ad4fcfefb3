"""Core data model: options, camera, materials, meshes, scene, film."""
