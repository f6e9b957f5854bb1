"""Multi-chip parallelism: particle-axis sharding over a device mesh."""

from . import distributed
from .sharding import (PARTICLE_AXIS, init_sharded_state, make_mesh,
                       make_sharded_scan_fn, make_sharded_step_fn,
                       shard_state, state_shardings)

__all__ = [
    "PARTICLE_AXIS", "distributed", "init_sharded_state", "make_mesh",
    "make_sharded_scan_fn", "make_sharded_step_fn", "shard_state",
    "state_shardings",
]
