"""Semi-global matching path aggregation (jittable JAX reference path).

Implements the SGM recurrence the reference gets from OpenCV's C++
(implicit behind ``StereoSGBM_create``, params at
``stereo_vision/stereo_vision.py:148-157``):

    L_r(p, d) = C(p, d) + min( L_r(p-r, d),
                               L_r(p-r, d-1) + P1,
                               L_r(p-r, d+1) + P1,
                               min_k L_r(p-r, k) + P2 ) - min_k L_r(p-r, k)

aggregated over ``num_paths`` directions (8, 4, or 2).

TPU-first design. Volumes are in planes layout (D, H, W) — W on lanes, D on
the major axis — so every operation in the scan step is a *slice*: the d±1
neighbors are major-axis shifts, and min_k is a reduction over the major
axis. Every direction is canonicalized to one primitive — a scan along axis
1 of a (D, S, N) volume — by transpose (horizontal paths), flip (reverse
paths), and shear (diagonal paths; out-of-frame cells are zero-filled,
which makes the recurrence self-reset at the frame boundary since a zero
carry contributes exactly 0).

This module is the correctness reference and CPU fallback; the fused Pallas
kernel (``ops/pallas_kernels.py``) implements the same canonical scan with
VMEM-resident carries. The multi-chip variant (row-sharded with ppermute'd
carries) lives in ``parallel/tiling.py``.
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


def scan_direction(cost: jnp.ndarray, p1: float, p2: float,
                   init_carry: jnp.ndarray | None = None,
                   unroll: int = 8) -> jnp.ndarray:
    """The canonical SGM scan: accumulate along axis 1 of (D, S, N).

    Returns L of the same shape. A slab of zeros behaves as "no
    predecessor" (its contribution to the min is 0 and its own min is 0, so
    the first slab gets L = C) — the property both the shear trick and the
    multi-chip carry hand-off rely on. ``init_carry`` (D, N) overrides the
    zero initial carry (used by the sharded scan to chain tiles).
    """
    cost = jnp.asarray(cost)
    if cost.dtype not in (jnp.float32, jnp.int16):
        cost = cost.astype(jnp.float32)
    dt = cost.dtype
    p1 = jnp.asarray(p1, dt)
    p2 = jnp.asarray(p2, dt)
    big = jnp.asarray(30000 if dt == jnp.int16 else 1e9, dt)

    def step(carry, c_slab):
        prev_min = jnp.min(carry, axis=0, keepdims=True)            # (1, N)
        up = jnp.concatenate([jnp.full_like(carry[:1], big),
                              carry[:-1]], axis=0)                  # L(d-1)
        down = jnp.concatenate([carry[1:],
                                jnp.full_like(carry[:1], big)], axis=0)
        m = jnp.minimum(jnp.minimum(carry, prev_min + p2),
                        jnp.minimum(up, down) + p1)
        L = c_slab + m - prev_min
        return L, L

    init = jnp.zeros_like(cost[:, 0]) if init_carry is None else init_carry
    _, out = jax.lax.scan(step, init, jnp.swapaxes(cost, 0, 1), unroll=unroll)
    return jnp.swapaxes(out, 0, 1)


def _shear(volume: jnp.ndarray, direction: int) -> jnp.ndarray:
    """Shear rows of (D, H, W) so diagonal predecessors align vertically.

    direction=+1 aligns (y-1, x-1) above (y, x); -1 aligns (y-1, x+1).
    Returns (D, H, W+H-1) with zeros outside the frame.
    """
    D, H, W = volume.shape
    Ws = W + H - 1
    y = jnp.arange(H)[:, None]
    xs = jnp.arange(Ws)[None, :]
    if direction > 0:
        x = xs - (H - 1 - y)     # column x' holds orig x = x' - (H-1-y)
    else:
        x = xs - y
    valid = (x >= 0) & (x < W)
    xc = jnp.clip(x, 0, W - 1)
    sheared = volume[:, y, xc]   # (D, H, Ws) gather on the lane axis
    return jnp.where(valid[None], sheared, jnp.zeros((), volume.dtype))


def _unshear(sheared: jnp.ndarray, direction: int, W: int) -> jnp.ndarray:
    H = sheared.shape[1]
    y = jnp.arange(H)[:, None]
    xo = jnp.arange(W)[None, :]
    xs = xo + (H - 1 - y) if direction > 0 else xo + y
    return sheared[:, y, xs]


def aggregate_direction(cost: jnp.ndarray, dy: int, dx: int,
                        p1: float, p2: float) -> jnp.ndarray:
    """Aggregate one path direction over a (D, H, W) volume."""
    if dy < 0:                        # canonicalize to downward scan (y-flip
        flipped = aggregate_direction(cost[:, ::-1], -dy, dx, p1, p2)
        return flipped[:, ::-1]       # keeps dx: a (-1,dx) step becomes (1,dx))
    if dy == 0:                       # horizontal: scan over x
        vol = jnp.swapaxes(cost, 1, 2)    # (D, W, H)
        if dx < 0:
            vol = vol[:, ::-1]
        out = scan_direction(vol, p1, p2)
        if dx < 0:
            out = out[:, ::-1]
        return jnp.swapaxes(out, 1, 2)
    if dx == 0:                       # vertical
        return scan_direction(cost, p1, p2)
    # Diagonal: shear so the diagonal becomes a column, scan, unshear.
    sheared = _shear(cost, dx)
    out = scan_direction(sheared, p1, p2)
    return _unshear(out, dx, cost.shape[2])


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
    acc_dtype = jnp.int16 if jnp.asarray(cost).dtype == jnp.int16 else jnp.float32
    total = jnp.zeros(cost.shape, acc_dtype)
    for dy, dx in PATH_DIRECTIONS_8[:num_paths]:
        total = total + aggregate_direction(cost, dy, dx, p1, p2)
    return total
