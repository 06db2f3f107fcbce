from .sharding import (  # noqa: F401
    make_mesh,
    shard_state,
    sharded_simulation,
    state_shardings,
    replicate_state,
)
