from .mesh import make_mesh, shard_state, shard_reads  # noqa: F401
