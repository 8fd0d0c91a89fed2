from .mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    emote_param_sharding_rules,
    shard_params,
    init_distributed,
)
