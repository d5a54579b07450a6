"""Device-mesh parallel evaluation (obs-axis data parallelism)."""

from .sharding import (
    OBS_AXIS,
    make_mesh,
    obs_sharding,
    pad_to_multiple,
    prepared_evaluator,
    prepared_stack_evaluator,
    replicated,
    shard_obs,
    sharded_evaluator,
)

__all__ = [
    "OBS_AXIS",
    "make_mesh",
    "obs_sharding",
    "pad_to_multiple",
    "prepared_evaluator",
    "prepared_stack_evaluator",
    "replicated",
    "shard_obs",
    "sharded_evaluator",
]
