"""Visualization / debug QA surface.

Capability parity with the reference's ``plot_functions.py`` (SURVEY.md §2
#13): camera-pose triads, rectified pairs with horizontal epipolar rule
lines (the human rectification check, ``plot_functions.py:79-80``), raw vs
filtered disparity views — plus a perceptual disparity colormap the
reference lacked. All functions render to matplotlib figures (headless
"Agg" safe) and return the figure.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def axis_equal_3d(ax) -> None:
    """Equalize 3-D axis scales (``plot_functions.py:14-30`` parity)."""
    extents = np.array([getattr(ax, f"get_{dim}lim")() for dim in "xyz"])
    centers = np.mean(extents, axis=1)
    r = np.max(np.abs(extents[:, 1] - extents[:, 0])) / 2
    for center, dim in zip(centers, "xyz"):
        getattr(ax, f"set_{dim}lim")(center - r, center + r)


def plot_camera(ax, pose: np.ndarray, label: str = "", scale: float = 0.1) -> None:
    """RGB axis triad for a camera pose (``plot_functions.py:33-48``)."""
    origin = pose[:3, 3]
    ax.scatter(*origin)
    for axis, color in zip(range(3), ("red", "green", "blue")):
        ax.quiver(*origin, *pose[:3, axis], color=color, length=scale)
    if label:
        ax.text(*(origin + 0.05), label)


def plot_transforms(poses, labels=None, scale: float = 0.1):
    """Plot a trajectory of camera poses (``plot_functions.py:111-126``)."""
    plt = _plt()
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    for i, pose in enumerate(poses):
        label = labels[i] if labels else str(i)
        plot_camera(ax, np.asarray(pose), label, scale)
    axis_equal_3d(ax)
    return fig


def show_image_pair(left: np.ndarray, right: np.ndarray,
                    line_spacing: int = 25, title: str = "rectified pair"):
    """Side-by-side pair with horizontal epipolar rule lines every
    ``line_spacing`` px (``plot_functions.py:51-83``): matched features
    must lie on the same line after rectification."""
    plt = _plt()
    left = np.asarray(left)
    right = np.asarray(right)
    pair = np.concatenate([left, right], axis=1)
    fig, ax = plt.subplots(figsize=(12, 5))
    ax.imshow(pair, cmap="gray" if pair.ndim == 2 else None)
    for y in range(line_spacing, pair.shape[0], line_spacing):
        ax.axhline(y, color="lime", linewidth=0.5)
    ax.set_title(title)
    ax.axis("off")
    return fig


def show_disparity(raw: np.ndarray, filtered: np.ndarray | None = None,
                   title: str = "disparity"):
    """Raw (and optionally filtered) disparity, min-max normalized
    (``plot_functions.py:86-108``)."""
    plt = _plt()
    n = 2 if filtered is not None else 1
    fig, axes = plt.subplots(1, n, figsize=(7 * n, 4), squeeze=False)
    for ax, (img, name) in zip(
            axes[0], [(raw, "raw")] + ([(filtered, "filtered")] if n == 2 else [])):
        im = ax.imshow(np.asarray(img), cmap="turbo")
        ax.set_title(f"{title} ({name})")
        ax.axis("off")
        fig.colorbar(im, ax=ax, shrink=0.8)
    return fig


def colorize_disparity(disparity: np.ndarray,
                       d_min: float | None = None,
                       d_max: float | None = None) -> np.ndarray:
    """Disparity -> RGB uint8 with the turbo colormap; NaN -> black."""
    import matplotlib
    d = np.asarray(disparity, np.float64)
    valid = np.isfinite(d)
    lo = d_min if d_min is not None else (np.nanmin(d) if valid.any() else 0)
    hi = d_max if d_max is not None else (np.nanmax(d) if valid.any() else 1)
    norm = np.clip((d - lo) / max(hi - lo, 1e-9), 0, 1)
    rgba = matplotlib.colormaps["turbo"](np.where(valid, norm, 0))
    rgb = (rgba[..., :3] * 255).astype(np.uint8)
    rgb[~valid] = 0
    return rgb
