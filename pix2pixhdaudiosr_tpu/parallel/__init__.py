from .mesh import make_mesh, batch_sharding, replicated, shard_batch  # noqa: F401
