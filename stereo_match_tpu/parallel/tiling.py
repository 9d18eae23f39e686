"""Row-sharded SGM: spatial tiling across chips with carry hand-off.

The stereo analog of sequence parallelism (SURVEY.md §5): SGM's directional
recurrences are sequential along their path, so sharding image rows across
chips cuts every *horizontal* scan into fully-local work, while *vertical
and diagonal* scans must chain a carry — the (D, N) slab of path costs at
the shard boundary — from each shard to the next, exactly the
ring/blockwise-scan pattern (ppermute over ICI).

Two modes:

* ``exact`` — a sequential chain: shard k runs its local scan initialized
  with shard k-1's final carry, delivered by ``lax.ppermute``. Outputs are
  bit-identical to the single-chip scan (tested). Wall-clock for the
  chained directions doesn't shrink with shards (the dependency is real),
  but horizontal scans, cost build, and WTA all scale.
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from stereo_match_tpu.ops.sgm import scan_direction


def _chained_scan(cost_local: jnp.ndarray, p1: float, p2: float,
                  axis_name: str, reverse: bool) -> jnp.ndarray:
    """Exact cross-shard scan along axis 1 of the local (D, H_loc, N) block.

    Sequential over shards: step k's ppermute moves each shard's final
    carry to its successor; shard k's real output is computed at step k.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    vol = cost_local[:, ::-1] if reverse else cost_local
    D, Hl, N = vol.shape

    if reverse:      # carry flows bottom shard -> top shard
        perm = [(i, i - 1) for i in range(1, n)]
        active = lambda k: (n - 1 - k) == idx
    else:
        perm = [(i, i + 1) for i in range(n - 1)]
        active = lambda k: k == idx

    def body(k, state):
        carry_in, out = state
        local_out = scan_direction(vol, p1, p2, init_carry=carry_in)
        final = local_out[:, -1]
        out = jnp.where(active(k), local_out, out)
        carry_next = jax.lax.ppermute(final, axis_name, perm)
        return carry_next, out

    init = (jnp.zeros((D, N), jnp.float32), jnp.zeros_like(vol))
    _, out = jax.lax.fori_loop(0, n, body, init)
    return out[:, ::-1] if reverse else out


def _halo_scan(cost_local: jnp.ndarray, p1: float, p2: float,
               axis_name: str, reverse: bool, halo: int) -> jnp.ndarray:
    """Approximate cross-shard scan: warm up through ``halo`` copied rows."""
    vol = cost_local[:, ::-1] if reverse else cost_local
    D, Hl, N = vol.shape
    h = min(halo, Hl)
    n = jax.lax.axis_size(axis_name)
    # scan-order predecessor: the shard above (fwd) / below (rev)
    if reverse:
        perm = [(i, i - 1) for i in range(1, n)]
    else:
        perm = [(i, i + 1) for i in range(n - 1)]
    # rows feeding my warm-up = predecessor's last h rows in scan order
    tail = vol[:, -h:]
    warmup = jax.lax.ppermute(tail, axis_name, perm)  # shard 0 receives zeros
    ext = jnp.concatenate([warmup, vol], axis=1)
    out = scan_direction(ext, p1, p2)[:, h:]
    return out[:, ::-1] if reverse else out


def _local_sgm_8(cost_local: jnp.ndarray, p1: float, p2: float,
                 num_paths: int, axis_name: str, mode: str,
                 halo: int) -> jnp.ndarray:
    """Per-shard 2/4/8-path aggregation with cross-shard vertical chains.

    Runs inside shard_map on the local (D, H_loc, W) block. Horizontal
    paths never cross row shards; vertical paths chain carries. Diagonal
    paths are approximated by halo warm-up in both modes (their carry
    crosses *and drifts* one column per row, so an exact chain would need a
    wavefront; with halo >= 2x the SGM forgetting length the residual is
    below float noise — validated in tests).
    """
    D, Hl, W = cost_local.shape

    # horizontal: local scans over W
    volT = jnp.swapaxes(cost_local, 1, 2)
    t = scan_direction(volT, p1, p2)
    t = t + scan_direction(volT[:, ::-1], p1, p2)[:, ::-1]
    total = jnp.swapaxes(t, 1, 2)
    if num_paths == 2:
        return total

    # vertical: cross-shard chains
    scan = _chained_scan if mode == "exact" else functools.partial(
        _halo_scan, halo=halo)
    total = total + scan(cost_local, p1, p2, axis_name, reverse=False)
    total = total + scan(cost_local, p1, p2, axis_name, reverse=True)
    if num_paths == 4:
        return total

    # diagonals: shear locally, warm up via halo exchange of sheared rows.
    # Shearing is row-local, so the predecessor's sheared tail is exactly
    # what the diagonal paths need — but the shear offset differs per
    # shard; align by shearing the *global* row index.
    row0 = jax.lax.axis_index(axis_name) * Hl
    H_total = jax.lax.axis_size(axis_name) * Hl
    for direction in (1, -1):
        sh = _shear_rows(cost_local, direction, row0, H_total)
        agg = _halo_scan(sh, p1, p2, axis_name, reverse=False, halo=halo)
        agg = agg + _halo_scan(sh, p1, p2, axis_name, reverse=True, halo=halo)
        total = total + _unshear_rows(agg, direction, row0, H_total, W)
    return total


def _shear_rows(volume: jnp.ndarray, direction: int, row0, H_total: int) -> jnp.ndarray:
    """Shear local rows by their *global* row index (traced ``row0``)."""
    D, Hl, W = volume.shape
    Ws = W + H_total - 1
    y = row0 + jnp.arange(Hl)[:, None]
    xs = jnp.arange(Ws)[None, :]
    x = xs - (H_total - 1 - y) if direction > 0 else xs - y
    valid = (x >= 0) & (x < W)
    xc = jnp.clip(x, 0, W - 1)
    local_rows = jnp.arange(Hl)[:, None]
    return jnp.where(valid[None], volume[:, local_rows, xc], 0.0)


def _unshear_rows(sheared: jnp.ndarray, direction: int, row0, H_total: int,
                  W: int) -> jnp.ndarray:
    D, Hl, Ws = sheared.shape
    y = row0 + jnp.arange(Hl)[:, None]
    xo = jnp.arange(W)[None, :]
    xs = xo + (H_total - 1 - y) if direction > 0 else xo + y
    local_rows = jnp.arange(Hl)[:, None]
    return sheared[:, local_rows, xs]


def sgm_aggregate_sharded(cost: jnp.ndarray, p1: float, p2: float,
                          mesh: Mesh, num_paths: int = 8,
                          mode: str = "exact", halo: int = 48) -> jnp.ndarray:
    """Row-sharded SGM aggregation over ``mesh``'s "rows" axis.

    ``cost``: (D, H, W) with H divisible by the rows-axis size. ``mode``:
    "exact" (bit-parity with single chip on vertical paths) or "halo"
    (linear scaling, numerically invisible boundary effects). Diagonals
    always use halo warm-up (see ``_local_sgm_8``).
    """
    if num_paths not in (2, 4, 8):
        raise ValueError("num_paths must be 2, 4 or 8")
    spec = P(None, "rows", None)

    fn = functools.partial(_local_sgm_8, p1=p1, p2=p2, num_paths=num_paths,
                           axis_name="rows", mode=mode, halo=halo)
    return shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                     check_rep=False)(cost)
