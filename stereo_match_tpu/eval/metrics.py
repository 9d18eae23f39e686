"""Disparity evaluation metrics (bad-px, EPE, density).

The reference computes no metrics at all — QA was visual (SURVEY.md §4-5) —
so this module is new capability required by the framework's accuracy
targets (BASELINE.md: bad-3px / EPE parity on KITTI-2015 & Middlebury).
Jittable JAX; also accepts numpy.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _valid_mask(pred, gt, extra_mask=None):
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    mask = jnp.isfinite(gt) & jnp.isfinite(pred)
    if extra_mask is not None:
        mask = mask & jnp.asarray(extra_mask, bool)
    return pred, gt, mask


def bad_pixel_rate(pred, gt, threshold: float = 3.0,
                   relative: float = 0.05, mask=None) -> jnp.ndarray:
    """Fraction of valid pixels with error > threshold (KITTI D1 semantics).

    A pixel is bad when |pred-gt| > threshold AND |pred-gt| > relative*|gt|
    (the KITTI-2015 D1 definition; set relative=0 for plain bad-N).
    """
    pred, gt, m = _valid_mask(pred, gt, mask)
    err = jnp.abs(pred - gt)
    bad = (err > threshold) & (err > relative * jnp.abs(gt))
    n = jnp.maximum(jnp.sum(m), 1)
    return jnp.sum(bad & m) / n


def end_point_error(pred, gt, mask=None) -> jnp.ndarray:
    """Mean absolute disparity error over valid pixels."""
    pred, gt, m = _valid_mask(pred, gt, mask)
    err = jnp.where(m, jnp.abs(pred - gt), 0.0)
    n = jnp.maximum(jnp.sum(m), 1)
    return jnp.sum(err) / n


def density(pred, valid_value: float = 0.0) -> jnp.ndarray:
    """Fraction of pixels carrying a valid (finite, > valid_value) estimate."""
    pred = jnp.asarray(pred, jnp.float32)
    return jnp.mean((jnp.isfinite(pred) & (pred > valid_value)).astype(jnp.float32))


def compare_disparities(pred, gt, mask=None) -> dict:
    """Full scorecard as plain floats (for CLI / benchmark JSON output)."""
    return {
        "epe": float(end_point_error(pred, gt, mask)),
        "bad1": float(bad_pixel_rate(pred, gt, 1.0, 0.0, mask)),
        "bad2": float(bad_pixel_rate(pred, gt, 2.0, 0.0, mask)),
        "bad3": float(bad_pixel_rate(pred, gt, 3.0, 0.0, mask)),
        "d1": float(bad_pixel_rate(pred, gt, 3.0, 0.05, mask)),
        "density": float(density(pred)),
        "valid_px": int(np.sum(np.isfinite(np.asarray(gt)))),
    }
