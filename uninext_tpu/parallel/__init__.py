from .mesh import create_mesh, shard_batch  # noqa: F401
