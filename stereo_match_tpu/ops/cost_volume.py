"""Matching-cost volume construction (jittable JAX reference path).

Builds (H, W, D) cost volumes — D on the last (lane) axis, which is the
TPU-native layout (D=128 is exactly one lane tile) — for the cost families
the reference delegates to native code (SURVEY.md §2 N2):

* census + Hamming (default; robust, integer VPU ops),
* SAD / SSD block costs (the ``StereoBM`` capability,
  ``stereo_vision/stereo_vision.py:165-166``),
* Birchfield–Tomasi on x-Sobel prefiltered images with ``pre_filter_cap``
  (the pixel cost inside OpenCV's ``StereoSGBM``, implicit at
  ``stereo_vision/stereo_vision.py:153``).

A Pallas fused kernel covers the hot census path (`ops/pallas_kernels.py`);
these XLA versions are the correctness reference and the CPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stereo_match_tpu.ops.census import census_transform, hamming_distance

# Cost assigned where the right-image sample at x-d falls off the frame.
# Finite (not inf) so SGM arithmetic stays NaN-free in any dtype.
INVALID_COST = jnp.float32(1e4)


def _shift_right_image(arr: jnp.ndarray, d: int | jnp.ndarray) -> jnp.ndarray:
    """arr[..., x] -> arr[..., x - d] with edge fill; works under vmap."""
    W = arr.shape[1]
    idx = jnp.arange(W) - d
    idx = jnp.clip(idx, 0, W - 1)
    return jnp.take(arr, idx, axis=1)


def _disparity_mask(W: int, disparities: jnp.ndarray) -> jnp.ndarray:
    """(W, D) bool: True where x - d >= 0 (right sample in frame)."""
    x = jnp.arange(W)[:, None]
    return x - disparities[None, :] >= 0


def census_cost_volume(left: jnp.ndarray, right: jnp.ndarray,
                       num_disparities: int, min_disparity: int = 0,
                       window: tuple[int, int] = (5, 5)) -> jnp.ndarray:
    """(H, W, D) float32 Hamming cost between census descriptors."""
    cl = census_transform(left, window)    # (H, W, words)
    cr = census_transform(right, window)
    disparities = min_disparity + jnp.arange(num_disparities)

    def cost_at(d):
        return hamming_distance(cl, _shift_right_image(cr, d)).astype(jnp.float32)

    vol = jax.vmap(cost_at, out_axes=-1)(disparities)  # (H, W, D)
    mask = _disparity_mask(left.shape[1], disparities)
    return jnp.where(mask[None], vol, INVALID_COST)


def _box_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean filter over a size x size window on leading (H, W) axes.

    Separable running-sum via cumsum (O(HW) independent of window size);
    edge handling divides by the true in-frame window area.
    """
    if size <= 1:
        return x

    def along(a, axis):
        r = size // 2
        pad = [(0, 0)] * a.ndim
        pad[axis] = (r + 1, r)
        c = jnp.cumsum(jnp.pad(a, pad), axis=axis, dtype=jnp.float32)
        hi = jax.lax.slice_in_dim(c, size, c.shape[axis], axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, c.shape[axis] - size, axis=axis)
        return hi - lo

    ones = jnp.ones(x.shape[:2], jnp.float32)
    if x.ndim == 3:
        ones = ones[..., None]
    summed = along(along(x.astype(jnp.float32), 0), 1)
    counts = along(along(ones, 0), 1)
    return summed / counts


def sad_cost_volume(left: jnp.ndarray, right: jnp.ndarray,
                    num_disparities: int, min_disparity: int = 0,
                    block_size: int = 5, squared: bool = False) -> jnp.ndarray:
    """(H, W, D) block SAD (or SSD) cost — the StereoBM capability."""
    l = jnp.asarray(left, jnp.float32)
    r = jnp.asarray(right, jnp.float32)
    disparities = min_disparity + jnp.arange(num_disparities)

    def cost_at(d):
        diff = l - _shift_right_image(r, d)
        e = diff * diff if squared else jnp.abs(diff)
        return _box_filter(e, block_size)

    vol = jax.vmap(cost_at, out_axes=-1)(disparities)
    mask = _disparity_mask(l.shape[1], disparities)
    return jnp.where(mask[None], vol, INVALID_COST)


def sobel_x_clipped(image: jnp.ndarray, pre_filter_cap: int = 63) -> jnp.ndarray:
    """Horizontal Sobel response clipped to [-cap, cap], shifted to [0, 2cap].

    The SGBM prefilter: matching then happens on this gradient image, which
    is what ``pre_filter_cap`` (settings.ini:19) controls.
    """
    img = jnp.asarray(image, jnp.float32)
    p = jnp.pad(img, 1, mode="edge")
    gx = (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:]
          - p[:-2, :-2] - 2 * p[1:-1, :-2] - p[2:, :-2]) / 4.0
    cap = jnp.float32(pre_filter_cap)
    return jnp.clip(gx, -cap, cap) + cap


def _bt_pixel_cost(l: jnp.ndarray, r: jnp.ndarray, d) -> jnp.ndarray:
    """Birchfield–Tomasi sampling-insensitive |difference| at disparity d.

    Compares each left pixel against the interval spanned by the right
    pixel and its half-sample neighbors (and symmetrically), which removes
    sampling aliasing on slanted surfaces.
    """
    rs = _shift_right_image(r, d)
    # Half-sample interpolants of the shifted right signal along x.
    r_prev = jnp.concatenate([rs[:, :1], rs[:, :-1]], axis=1)
    r_next = jnp.concatenate([rs[:, 1:], rs[:, -1:]], axis=1)
    r_minus = (rs + r_prev) / 2.0
    r_plus = (rs + r_next) / 2.0
    r_lo = jnp.minimum(jnp.minimum(r_minus, r_plus), rs)
    r_hi = jnp.maximum(jnp.maximum(r_minus, r_plus), rs)
    d_lr = jnp.maximum(0.0, jnp.maximum(l - r_hi, r_lo - l))

    l_prev = jnp.concatenate([l[:, :1], l[:, :-1]], axis=1)
    l_next = jnp.concatenate([l[:, 1:], l[:, -1:]], axis=1)
    l_minus = (l + l_prev) / 2.0
    l_plus = (l + l_next) / 2.0
    l_lo = jnp.minimum(jnp.minimum(l_minus, l_plus), l)
    l_hi = jnp.maximum(jnp.maximum(l_minus, l_plus), l)
    d_rl = jnp.maximum(0.0, jnp.maximum(rs - l_hi, l_lo - rs))
    return jnp.minimum(d_lr, d_rl)


def bt_cost_volume(left: jnp.ndarray, right: jnp.ndarray,
                   num_disparities: int, min_disparity: int = 0,
                   pre_filter_cap: int = 63, block_size: int = 5) -> jnp.ndarray:
    """(H, W, D) BT cost on x-Sobel prefiltered images, box-aggregated.

    The closest analog of OpenCV SGBM's pixel cost (SURVEY.md §7 hard
    parts): gradient-domain BT with ``pre_filter_cap``, then block_size
    box aggregation.
    """
    ls = sobel_x_clipped(left, pre_filter_cap)
    rs = sobel_x_clipped(right, pre_filter_cap)
    disparities = min_disparity + jnp.arange(num_disparities)

    def cost_at(d):
        return _box_filter(_bt_pixel_cost(ls, rs, d), block_size)

    vol = jax.vmap(cost_at, out_axes=-1)(disparities)
    mask = _disparity_mask(ls.shape[1], disparities)
    return jnp.where(mask[None], vol, INVALID_COST)


@functools.partial(jax.jit, static_argnames=("num_disparities", "min_disparity",
                                             "cost", "block_size", "window",
                                             "pre_filter_cap"))
def build_cost_volume(left: jnp.ndarray, right: jnp.ndarray,
                      num_disparities: int, min_disparity: int = 0,
                      cost: str = "census", block_size: int = 5,
                      window: tuple[int, int] = (5, 5),
                      pre_filter_cap: int = 63) -> jnp.ndarray:
    """Dispatch to the named cost family (census | sad | ssd | bt)."""
    if cost == "census":
        return census_cost_volume(left, right, num_disparities, min_disparity, window)
    if cost == "sad":
        return sad_cost_volume(left, right, num_disparities, min_disparity, block_size)
    if cost == "ssd":
        return sad_cost_volume(left, right, num_disparities, min_disparity,
                               block_size, squared=True)
    if cost == "bt":
        return bt_cost_volume(left, right, num_disparities, min_disparity,
                              pre_filter_cap, block_size)
    raise ValueError(f"unknown cost family: {cost}")
