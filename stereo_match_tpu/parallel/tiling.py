"""Row-sharded SGM: spatial tiling across chips with carry hand-off.

The stereo analog of sequence parallelism (SURVEY.md §5): SGM's directional
recurrences are sequential along their path, so sharding image rows across
chips cuts every *horizontal* scan into fully-local work, while *vertical
and diagonal* scans must chain a carry — the (D, N) slab of path costs at
the shard boundary — from each shard to the next, exactly the
ring/blockwise-scan pattern (ppermute over ICI).

The local compute is the Pallas fast path (``ops/pallas_kernels.py``), not
the dispatch-bound ``lax.scan`` reference: the sharded kernels are the same
kernels the single-chip pipeline runs, with the carry slab threaded through
``init_carry``/``return_carry``. On CPU meshes (tests, dryrun) the kernels
run in interpret mode.

Two modes:

* ``exact`` — a sequential chain: shard k runs its local scan initialized
  with shard k-1's final carry, delivered by ``lax.ppermute``. Outputs are
  bit-identical to the single-chip Pallas kernels at matching tile_n —
  including both diagonals, whose lane-shifted carries travel inside the
  fused scan3's (3, D, N) slab (the shift belongs to the consuming row's
  step, so the slab needs no re-anchoring at shard boundaries). Each shard
  computes its local scan ONCE, at its step in the chain (``lax.cond``);
  wall-clock for the chained directions doesn't shrink with shards (the
  dependency is real), but horizontal scans, cost build, and WTA all scale.
* ``halo`` — shard k additionally scans ``halo`` warm-up rows copied from
  shard k-1 (one ppermute of a (D, halo, N) slab) and discards them. The
  SGM recurrence forgets its initial state geometrically (P2 clamps the
  influence), so a 32-64 row halo makes boundary effects numerically
  invisible while every direction scales linearly.

All functions here run *inside* ``shard_map`` over a mesh "rows" axis; the
public entry is :func:`sgm_aggregate_sharded`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stereo_match_tpu.ops.pallas_kernels import (sgm_scan3_pallas,
                                                 sgm_scan_pallas)


def _chain(scan_fn, carry_shape, fallback_out, axis_name: str,
           reverse: bool, dtype) -> jnp.ndarray:
    """Exact cross-shard scan: sequential carry chain over the shard axis.

    ``scan_fn(carry_in) -> (out, carry_out)`` runs the local Pallas scan.
    Each shard computes exactly once — at its position in the chain, gated
    by ``lax.cond`` (the round-1 version re-ran every shard's scan at every
    step: O(n * H_loc) work per shard instead of O(H_loc)). The other n-1
    steps cost one ppermute of the (*, D, N) carry slab over ICI.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if reverse:      # carry flows bottom shard -> top shard
        perm = [(i, i - 1) for i in range(1, n)]
        my_step = n - 1 - idx
    else:
        perm = [(i, i + 1) for i in range(n - 1)]
        my_step = idx

    def body(k, state):
        carry_in, out, cout = state
        out, cout = jax.lax.cond(
            k == my_step,
            lambda ci: scan_fn(ci),
            lambda ci: (out, cout),
            carry_in)
        carry_next = jax.lax.ppermute(cout, axis_name, perm)
        return carry_next, out, cout

    zero_carry = jnp.zeros(carry_shape, dtype)
    init = (zero_carry, jnp.zeros_like(fallback_out), zero_carry)
    _, out, _ = jax.lax.fori_loop(0, n, body, init)
    return out


def _halo_scan(vol: jnp.ndarray, accum: jnp.ndarray | None, p1, p2,
               axis_name: str, reverse: bool, halo: int, fused3: bool,
               interpret: bool) -> jnp.ndarray:
    """Approximate cross-shard scan: warm up through ``halo`` copied rows.

    One ppermute of the predecessor's (D, halo, N) tail (in scan order),
    then a purely local Pallas scan over the extended block; warm-up rows
    are dropped. ``fused3`` selects the 3-direction fused kernel.
    """
    D, Hl, N = vol.shape
    h = max(1, min(halo, Hl))
    n = jax.lax.axis_size(axis_name)
    kernel = sgm_scan3_pallas if fused3 else sgm_scan_pallas
    if reverse:      # scan-order predecessor is the shard below
        perm = [(i, i - 1) for i in range(1, n)]
        warm = jax.lax.ppermute(vol[:, :h], axis_name, perm)
        ext = jnp.concatenate([vol, warm], axis=1)
        out = kernel(ext, None, p1, p2, reverse=True,
                     interpret=interpret)[:, :Hl]
    else:
        perm = [(i, i + 1) for i in range(n - 1)]
        warm = jax.lax.ppermute(vol[:, -h:], axis_name, perm)
        ext = jnp.concatenate([warm, vol], axis=1)
        out = kernel(ext, None, p1, p2, reverse=False,
                     interpret=interpret)[:, h:]
    return out if accum is None else accum + out


def _local_sgm(cost_local: jnp.ndarray, p1: float, p2: float,
               num_paths: int, axis_name: str, mode: str, halo: int,
               interpret: bool) -> jnp.ndarray:
    """Per-shard 2/4/8-path Pallas aggregation with cross-shard chains.

    Runs inside shard_map on the local (D, H_loc, W) block. Horizontal
    paths never cross row shards (local transpose-pair scans); vertical
    (4-path) or fused vertical+diagonal (8-path) passes chain their carry
    slab exactly or warm up through a halo.
    """
    D, Hl, W = cost_local.shape

    # horizontal: local scans over W
    volT = jnp.swapaxes(cost_local, 1, 2)
    t = sgm_scan_pallas(volT, None, p1, p2, reverse=False,
                        interpret=interpret)
    t = sgm_scan_pallas(volT, t, p1, p2, reverse=True, interpret=interpret)
    total = jnp.swapaxes(t, 1, 2)
    if num_paths == 2:
        return total

    fused3 = num_paths == 8
    for rev in (False, True):
        if mode == "exact":
            if fused3:
                scan_fn = functools.partial(
                    sgm_scan3_pallas, cost_local, total, p1, p2, reverse=rev,
                    return_carry=True, interpret=interpret)
                fn = lambda ci, s=scan_fn: s(init_carry=ci)
                carry_shape = (3, D, W)
            else:
                scan_fn = functools.partial(
                    sgm_scan_pallas, cost_local, total, p1, p2, reverse=rev,
                    return_carry=True, interpret=interpret)
                fn = lambda ci, s=scan_fn: s(init_carry=ci)
                carry_shape = (D, W)
            total = _chain(fn, carry_shape, total, axis_name, rev,
                           cost_local.dtype)
        else:
            total = _halo_scan(cost_local, total, p1, p2, axis_name, rev,
                               halo, fused3, interpret)
    return total


def sgm_aggregate_sharded(cost: jnp.ndarray, p1: float, p2: float,
                          mesh: Mesh, num_paths: int = 8,
                          mode: str = "exact", halo: int = 48) -> jnp.ndarray:
    """Row-sharded SGM aggregation over ``mesh``'s "rows" axis.

    ``cost``: (D, H, W); H is zero-padded as needed (free: zero rows keep a
    zero carry, see ``ops/sgm.py``). ``mode``: "exact" (bit-parity with the
    single-chip Pallas kernels, all 8 directions) or "halo" (linear
    scaling, numerically invisible boundary effects).
    """
    if num_paths not in (2, 4, 8):
        raise ValueError("num_paths must be 2, 4 or 8")
    if mode not in ("exact", "halo"):
        raise ValueError("mode must be 'exact' or 'halo'")
    cost = jnp.asarray(cost)
    if cost.dtype not in (jnp.float32, jnp.int16):
        cost = cost.astype(jnp.float32)
    D, H, W = cost.shape
    rows = mesh.shape["rows"]
    # exact mode chains the carry out of each shard's final row, which
    # requires whole sublane blocks per shard (see sgm_scan_pallas)
    s_blk = 8 if cost.dtype.itemsize == 4 else 16
    unit = rows * (s_blk if mode == "exact" else 1)
    Hp = -(-H // unit) * unit
    if Hp != H:
        cost = jnp.pad(cost, ((0, 0), (0, Hp - H), (0, 0)))

    interpret = jax.default_backend() == "cpu"
    spec = P(None, "rows", None)
    fn = functools.partial(_local_sgm, p1=p1, p2=p2, num_paths=num_paths,
                           axis_name="rows", mode=mode, halo=halo,
                           interpret=interpret)
    out = shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                    check_vma=False)(cost)
    return out[:, :H] if Hp != H else out
