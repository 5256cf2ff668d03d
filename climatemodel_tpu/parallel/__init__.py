"""Multi-device parallelism: meshes, sharded halo exchange."""
