"""Speckle filtering: remove small connected blobs of outlier disparity.

The capability behind OpenCV SGBM's ``speckleWindowSize`` /
``speckleRange`` parameters (``stereo_vision/stereo_vision.py:159-160``,
settings.ini:13-16). Connected components are irregular host-style compute;
the TPU-native formulation is iterative min-label flood fill — a fixed
number of 4-neighbor label relaxations (pure elementwise mins + shifts,
fully vectorized) followed by a segment-sum to measure component sizes.

``max_iters`` bounds the component diameter that is *exactly* measured;
components larger than that are conservatively kept (they are by
construction larger than any sane speckle_window_size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _neighbor_shift(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift (H, W) by (dy, dx) filling exposed cells."""
    H, W = x.shape
    out = jnp.roll(x, (dy, dx), axis=(0, 1))
    if dy == 1:
        out = out.at[0, :].set(fill)
    elif dy == -1:
        out = out.at[-1, :].set(fill)
    if dx == 1:
        out = out.at[:, 0].set(fill)
    elif dx == -1:
        out = out.at[:, -1].set(fill)
    return out


@functools.partial(jax.jit, static_argnames=("max_speckle_size", "max_iters"))
def speckle_filter(disparity: jnp.ndarray, max_speckle_size: int,
                   max_diff: float, max_iters: int = 512) -> jnp.ndarray:
    """Invalidate (NaN) connected components smaller than max_speckle_size.

    Two pixels are connected when 4-adjacent and |d_a - d_b| <= max_diff —
    the OpenCV ``filterSpeckles`` notion of a speckle. ``max_speckle_size``
    <= 0 disables (the settings.ini default is 0).
    """
    if max_speckle_size <= 0:
        return disparity
    d = jnp.asarray(disparity, jnp.float32)
    H, W = d.shape
    valid = jnp.isfinite(d)
    big = jnp.int32(H * W + 1)
    init = jnp.where(
        valid,
        (jnp.arange(H)[:, None] * W + jnp.arange(W)[None, :]).astype(jnp.int32),
        big)

    dval = jnp.where(valid, d, jnp.float32(jnp.inf))

    def relax(labels):
        out = labels
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nl = _neighbor_shift(labels, dy, dx, big)
            nd = _neighbor_shift(dval, dy, dx, jnp.float32(jnp.inf))
            connected = valid & (jnp.abs(nd - dval) <= max_diff)
            out = jnp.minimum(out, jnp.where(connected, nl, big))
        return out

    # Iterate to a global fixpoint (geodesic-diameter many steps), capped at
    # max_iters. Pre-fixpoint termination could split a large component into
    # several labels and over-remove; the cap only bites on pathological
    # snake/spiral components far larger than any speckle.
    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        new = relax(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))

    flat = labels.reshape(-1)
    sizes = jax.ops.segment_sum(valid.reshape(-1).astype(jnp.int32), flat,
                                num_segments=H * W + 2)
    comp_size = sizes[flat].reshape(H, W)
    keep = comp_size >= max_speckle_size
    return jnp.where(keep & valid, d, jnp.nan)
