"""Winner-take-all disparity extraction with subpixel, uniqueness, and
left-right consistency (jittable JAX).

Replaces the post-aggregation stages inside OpenCV SGBM/BM (SURVEY.md §2
N4): argmin over D, parabola subpixel interpolation, uniqueness-ratio
check, and the disp12 LR check. The LR check here needs **no second
matcher** (the reference derives one via ``createRightMatcher``,
``stereo_vision/stereo_vision.py:171``): the right-view disparity is read
out of the same aggregated cost volume along the lines x_r = x_l - d.

Convention: invalid disparities are NaN in the float API;
:func:`to_fixed_point` converts to the reference's int16 disparity*16
contract (invalid -> (min_disparity - 1) * 16, as OpenCV emits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def wta_disparity(agg: jnp.ndarray) -> jnp.ndarray:
    """Integer argmin over the D axis of (H, W, D). Returns int32 (H, W)."""
    return jnp.argmin(agg, axis=-1).astype(jnp.int32)


def subpixel_refine(agg: jnp.ndarray, disp_idx: jnp.ndarray) -> jnp.ndarray:
    """Parabola interpolation around the winning disparity.

    d* = d + (C[d-1] - C[d+1]) / (2 * (C[d-1] - 2C[d] + C[d+1])), clamped to
    ±0.5; at the D-range edges the integer disparity is kept.
    """
    D = agg.shape[-1]
    d = disp_idx
    dm = jnp.clip(d - 1, 0, D - 1)
    dp = jnp.clip(d + 1, 0, D - 1)
    c0 = jnp.take_along_axis(agg, dm[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(agg, d[..., None], axis=-1)[..., 0]
    c2 = jnp.take_along_axis(agg, dp[..., None], axis=-1)[..., 0]
    denom = c0 - 2.0 * c1 + c2
    offset = jnp.where(denom > 1e-9, (c0 - c2) / (2.0 * jnp.maximum(denom, 1e-9)), 0.0)
    offset = jnp.clip(offset, -0.5, 0.5)
    at_edge = (d == 0) | (d == D - 1)
    return d.astype(jnp.float32) + jnp.where(at_edge, 0.0, offset)


def uniqueness_mask(agg: jnp.ndarray, disp_idx: jnp.ndarray,
                    uniqueness_ratio: int) -> jnp.ndarray:
    """True where the winner beats every non-neighbor cost by the ratio.

    OpenCV semantics: invalid if any d with |d - best| > 1 has
    cost[d] * 100 <= cost[best] * (100 + uniquenessRatio).
    """
    if uniqueness_ratio <= 0:
        return jnp.ones(agg.shape[:-1], bool)
    D = agg.shape[-1]
    best = jnp.take_along_axis(agg, disp_idx[..., None], axis=-1)
    ds = jnp.arange(D)
    neighbor = jnp.abs(ds[None, None, :] - disp_idx[..., None]) <= 1
    threshold = best * (100.0 + uniqueness_ratio) / 100.0
    violates = (agg <= threshold) & ~neighbor
    return ~jnp.any(violates, axis=-1)


def right_disparity_from_volume(agg: jnp.ndarray,
                                min_disparity: int = 0) -> jnp.ndarray:
    """Right-view WTA disparity from the left-anchored cost volume.

    C_right(y, x_r, d) = C_left(y, x_r + d, d): gather along the diagonal
    lines of constant x_l - d, then argmin over d. Out-of-frame samples get
    a huge cost. Returns float32 (H, W) right-view disparity (no subpixel —
    used only for the consistency check, as in OpenCV).
    """
    H, W, D = agg.shape
    ds = jnp.arange(D)
    xr = jnp.arange(W)
    xl = xr[:, None] + ds[None, :] + min_disparity      # (W, D)
    valid = xl < W
    xlc = jnp.clip(xl, 0, W - 1)
    # (H, W, D) gather: for each y, row[xlc[w, d], d]
    gathered = agg[:, xlc, ds[None, :]]
    gathered = jnp.where(valid[None], gathered, 1e9)
    return (jnp.argmin(gathered, axis=-1) + min_disparity).astype(jnp.float32)


def lr_consistency_mask(disp_left: jnp.ndarray, disp_right: jnp.ndarray,
                        disp12_max_diff: int,
                        min_disparity: int = 0) -> jnp.ndarray:
    """disp12 check: |d_L(x) - d_R(x - d_L(x))| <= disp12_max_diff.

    ``disp12_max_diff < 0`` disables the check (OpenCV convention,
    settings.ini:11).
    """
    if disp12_max_diff < 0:
        return jnp.ones(disp_left.shape, bool)
    H, W = disp_left.shape
    x = jnp.arange(W)[None, :].repeat(H, axis=0)
    xr = jnp.round(x - disp_left).astype(jnp.int32)
    inframe = (xr >= 0) & (xr < W)
    xrc = jnp.clip(xr, 0, W - 1)
    d_r = jnp.take_along_axis(disp_right, xrc, axis=1)
    ok = jnp.abs(disp_left - d_r) <= disp12_max_diff
    return ok & inframe


@functools.partial(jax.jit, static_argnames=("min_disparity", "uniqueness_ratio",
                                             "disp12_max_diff", "subpixel"))
def extract_disparity(agg: jnp.ndarray, min_disparity: int = 0,
                      uniqueness_ratio: int = 15, disp12_max_diff: int = 1,
                      subpixel: bool = True) -> jnp.ndarray:
    """Aggregated volume -> float32 disparity map with NaN invalids.

    The full OpenCV-equivalent WTA stage: argmin, uniqueness, subpixel,
    LR consistency. Speckle filtering is separate (``ops/speckle.py``).
    """
    agg = jnp.asarray(agg, jnp.float32)
    idx = wta_disparity(agg)
    disp = subpixel_refine(agg, idx) if subpixel else idx.astype(jnp.float32)
    disp = disp + min_disparity

    mask = uniqueness_mask(agg, idx, uniqueness_ratio)
    disp_right = right_disparity_from_volume(agg, min_disparity)
    mask = mask & lr_consistency_mask(disp, disp_right, disp12_max_diff,
                                      min_disparity)
    return jnp.where(mask, disp, jnp.nan)


def to_fixed_point(disparity: jnp.ndarray, min_disparity: int = 0) -> jnp.ndarray:
    """float NaN-invalid -> int16 disparity*16 (the reference's on-disk
    contract, ``stereo_vision/stereo_vision.py:144-146``)."""
    invalid = (min_disparity - 1) * 16
    fixed = jnp.where(jnp.isfinite(disparity),
                      jnp.round(disparity * 16.0), invalid)
    return fixed.astype(jnp.int16)


def from_fixed_point(disparity16: jnp.ndarray,
                     min_disparity: int = 0) -> jnp.ndarray:
    """int16 disparity*16 -> float with NaN invalids (inverse contract,
    reference divides by 16 at ``disparity_test.py:206``)."""
    d = disparity16.astype(jnp.float32) / 16.0
    return jnp.where(d < min_disparity, jnp.nan, d)
