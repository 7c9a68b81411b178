from .distributed import global_mesh, init_distributed, shard_weights_local  # noqa: F401
from .mesh import make_mesh, named, replicated  # noqa: F401
from .sharding import cache_sharding, shard_weights, token_sharding, validate_tp  # noqa: F401
