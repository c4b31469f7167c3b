from .mesh import make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    state_sharding,
    batch_sharding,
    shard_train_step,
)
