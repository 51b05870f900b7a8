from vitx.parallel.mesh import make_mesh
from vitx.parallel.pipeline import (
    make_pp_eval_step,
    make_pp_mesh,
    make_pp_train_step,
    place_pp_state,
    pp_bubble_fraction,
    pp_schedule_ticks,
    pp_state_sharding,
)
from vitx.parallel.sharded import (
    batch_sharding,
    grad_sharding,
    make_parallel_eval_step,
    make_parallel_train_step,
    param_sharding,
    shard_batch,
    shard_host_batch,
    state_sharding,
)

__all__ = [
    "make_mesh",
    "param_sharding",
    "state_sharding",
    "grad_sharding",
    "batch_sharding",
    "shard_batch",
    "shard_host_batch",
    "make_parallel_train_step",
    "make_parallel_eval_step",
    "make_pp_mesh",
    "pp_state_sharding",
    "place_pp_state",
    "make_pp_train_step",
    "make_pp_eval_step",
    "pp_schedule_ticks",
    "pp_bubble_fraction",
]
