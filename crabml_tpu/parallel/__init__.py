from .mesh import make_mesh, named, replicated  # noqa: F401
from .sharding import cache_sharding, shard_weights, token_sharding, validate_tp  # noqa: F401
