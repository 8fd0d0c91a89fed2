from .mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    emote_param_sharding_rules,
    shard_params,
    init_distributed,
    fsdp_extend_spec,
    fsdp_param_shardings,
    fsdp_shard_params,
    state_shardings_like,
)
