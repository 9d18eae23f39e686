"""Data-parallel stereo matching: a batch of pairs across the mesh.

The throughput-scaling mode (SURVEY.md §2 parallelism table, "DP" row):
each chip matches different frames of a capture session / video stream.
Perfect scaling — no cross-chip traffic during matching — and the mode the
fps-per-chip benchmark multiplies through.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_match_tpu.config import DisparityConfig


def batched_matcher(config: DisparityConfig, mesh: Mesh):
    """Compiled data-parallel matcher over the mesh's "batch" axis.

    Returns ``fn(lefts, rights) -> (raw, filtered)`` for (B, H, W) inputs;
    B must be divisible by the batch-axis size. Inputs are sharded on the
    leading axis; per-pair work is the single-chip pipeline (XLA sees the
    vmap over a sharded axis and keeps everything chip-local).
    """
    from stereo_match_tpu.pipeline.stereo import _match_core

    sharding = NamedSharding(mesh, P("batch", None, None))
    core = functools.partial(_match_core, cfg=config)

    @functools.partial(jax.jit, out_shardings=(sharding, sharding))
    def fn(lefts, rights):
        lefts = jax.lax.with_sharding_constraint(lefts, sharding)
        rights = jax.lax.with_sharding_constraint(rights, sharding)
        return jax.vmap(core)(lefts, rights)

    def wrapper(lefts, rights):
        l = jnp.asarray(np.asarray(lefts), jnp.float32)
        r = jnp.asarray(np.asarray(rights), jnp.float32)
        return fn(l, r)

    return wrapper
