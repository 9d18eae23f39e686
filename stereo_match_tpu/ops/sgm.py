"""Semi-global matching path aggregation (jittable JAX reference path).

Implements the SGM recurrence the reference gets from OpenCV's C++
(implicit behind ``StereoSGBM_create``, params at
``stereo_vision/stereo_vision.py:148-157``):

    L_r(p, d) = C(p, d) + min( L_r(p-r, d),
                               L_r(p-r, d-1) + P1,
                               L_r(p-r, d+1) + P1,
                               min_k L_r(p-r, k) + P2 ) - min_k L_r(p-r, k)

aggregated over ``num_paths`` directions (8, 4, or 2).

TPU-first design: every direction is *canonicalized* to a single primitive —
a top-to-bottom scan over the leading axis of a (S, N, D) volume — by a
composition of transpose / flip / shear. Each scan step is elementwise math
plus a D-axis min on an (N, D) slab with D on the lanes, which is exactly
the VPU's preferred shape; diagonal paths become vertical ones after a shear
(gather) with zero-filled out-of-frame cells, whose costs are arranged so
the recurrence self-resets at the frame boundary (carry contribution 0).

The multi-chip variant (row-sharded with ppermute'd carries) lives in
``parallel/tiling.py``; the fused Pallas kernel in ``ops/pallas_kernels.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# (dy, dx) path directions, grouped so num_paths in {2, 4, 8} takes a prefix.
PATH_DIRECTIONS_8 = (
    (0, 1), (0, -1),            # horizontal (along the epipolar line)
    (1, 0), (-1, 0),            # vertical
    (1, 1), (-1, -1),           # main diagonal
    (1, -1), (-1, 1),           # anti diagonal
)


def scan_direction(cost: jnp.ndarray, p1: float, p2: float) -> jnp.ndarray:
    """The canonical SGM scan: accumulate along axis 0 of (S, N, D).

    Returns L of the same shape. A row of zeros behaves as "no predecessor"
    (its contribution to the min is 0 and its own min is 0, so the first
    row simply gets L = C) — the property the shear trick relies on.
    """
    cost = jnp.asarray(cost, jnp.float32)
    p1 = jnp.float32(p1)
    p2 = jnp.float32(p2)
    big = jnp.float32(1e9)

    def step(carry, c_row):
        prev_min = jnp.min(carry, axis=-1, keepdims=True)           # (N, 1)
        up = jnp.concatenate([jnp.full_like(carry[:, :1], big),
                              carry[:, :-1]], axis=1)               # L(d-1)
        down = jnp.concatenate([carry[:, 1:],
                                jnp.full_like(carry[:, :1], big)], axis=1)
        m = jnp.minimum(jnp.minimum(carry, prev_min + p2),
                        jnp.minimum(up, down) + p1)
        L = c_row + m - prev_min
        return L, L

    init = jnp.zeros_like(cost[0])
    _, out = jax.lax.scan(step, init, cost)
    return out


def _shear(volume: jnp.ndarray, direction: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shear rows so diagonal predecessors align vertically.

    direction=+1 aligns (y-1, x-1) above (y, x); -1 aligns (y-1, x+1).
    Returns (sheared (H, W+H-1, D) with zeros outside, original width W).
    """
    H, W, D = volume.shape
    Ws = W + H - 1
    y = jnp.arange(H)[:, None]
    xs = jnp.arange(Ws)[None, :]
    if direction > 0:
        x = xs - (H - 1 - y)     # column x' holds orig x = x' - (H-1-y)
    else:
        x = xs - y
    valid = (x >= 0) & (x < W)
    xc = jnp.clip(x, 0, W - 1)
    sheared = volume[jnp.arange(H)[:, None], xc]
    return jnp.where(valid[..., None], sheared, 0.0), valid


def _unshear(sheared: jnp.ndarray, direction: int, W: int) -> jnp.ndarray:
    H = sheared.shape[0]
    y = jnp.arange(H)[:, None]
    xo = jnp.arange(W)[None, :]
    if direction > 0:
        xs = xo + (H - 1 - y)
    else:
        xs = xo + y
    return sheared[jnp.arange(H)[:, None], xs]


def aggregate_direction(cost: jnp.ndarray, dy: int, dx: int,
                        p1: float, p2: float) -> jnp.ndarray:
    """Aggregate one path direction over an (H, W, D) volume."""
    vol = cost
    if dy == 0:                       # horizontal: scan over x
        vol = jnp.swapaxes(vol, 0, 1)     # (W, H, D)
        if dx < 0:
            vol = vol[::-1]
        out = scan_direction(vol, p1, p2)
        if dx < 0:
            out = out[::-1]
        return jnp.swapaxes(out, 0, 1)
    if dy < 0:                        # canonicalize to downward scan (y-flip
        flipped = aggregate_direction(cost[::-1], -dy, dx, p1, p2)
        return flipped[::-1]          # keeps dx: a (-1,dx) step becomes (1,dx))
    if dx == 0:                       # vertical
        return scan_direction(vol, p1, p2)
    # Diagonal: shear so the diagonal becomes a column, scan, unshear.
    sheared, _ = _shear(vol, dx)
    out = scan_direction(sheared, p1, p2)
    return _unshear(out, dx, cost.shape[1])


@functools.partial(jax.jit, static_argnames=("num_paths",))
def sgm_aggregate(cost: jnp.ndarray, p1: float, p2: float,
                  num_paths: int = 8) -> jnp.ndarray:
    """Sum of per-direction aggregations, S(p, d) = sum_r L_r(p, d).

    ``num_paths``: 8 (full), 4 (horizontal+vertical), or 2 (horizontal only
    — the cheapest option and the one whose multi-chip row-sharding needs
    no halo exchange at all).
    """
    if num_paths not in (2, 4, 8):
        raise ValueError("num_paths must be 2, 4 or 8")
    total = jnp.zeros_like(cost, shape=cost.shape, dtype=jnp.float32)
    for dy, dx in PATH_DIRECTIONS_8[:num_paths]:
        total = total + aggregate_direction(cost, dy, dx, p1, p2)
    return total
