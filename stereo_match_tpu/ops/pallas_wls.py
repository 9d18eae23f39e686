"""Pallas TPU kernels for the WLS fast-global-smoother (FGS).

The XLA FGS (``ops/wls.py``) is dispatch-bound the same way the XLA SGM
was: each of its 1-D Thomas solves is a ``lax.scan`` over W (or H) steps,
~1-2 us of loop overhead per step -> ~10 ms/frame at KITTI size, which is
what kept the WLS-included production pipeline under the 30 fps target in
round 2 (VERDICT.md "What's missing" #2). These kernels express the same
tridiagonal forward-elimination / back-substitution as Mosaic grids —
grid = (N-tiles, S-blocks), S sequential, carry in VMEM scratch, reversal
via the index map — exactly the structure of ``ops/pallas_kernels.py``.

Numerical compatibility: the per-step arithmetic mirrors
``ops.wls._tridiagonal_smooth_rows`` operation-for-operation (same
divisions, same order); outputs agree with the XLA reference to within
FMA-fusion ulps (~1e-7 relative; asserted in tests/test_refine.py).

Both right-hand sides of the confidence-weighted filter (conf*d and conf,
``ops.wls.wls_filter_disparity``) ride through one kernel as a C=2
channel axis: the eliminated superdiagonal cp is shared, so the second
RHS costs one extra multiply-divide per step instead of a second solve.

Reference capability: OpenCV's ``DisparityWLSFilter``
(``stereo_vision/stereo_vision.py:172-183``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


S_BLK = 8          # f32 sublane tile


def _fgs_fwd_kernel(lam_ref, wp_ref, wn_ref, f_ref, cp_ref, dp_ref,
                    carry_ref, *, s_blk, channels):
    """Forward elimination: per scan row s (sublane k of the block)

        a = -lam*wp[s]; c = -lam*wn[s]; b = 1 - a - c
        denom = b - a*cp_prev
        cp[s] = c / denom;  dp_c[s] = (f_c[s] - a*dp_prev_c) / denom

    carry scratch rows: 0 = cp_prev, 1..C = dp_prev per channel.
    """
    lam = lam_ref[0, 0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    cp_prev = carry_ref[0]
    dp_prev = [carry_ref[1 + c] for c in range(channels)]
    for k in range(s_blk):
        a = -lam * wp_ref[0, k, :]
        c = -lam * wn_ref[0, k, :]
        b = 1.0 - a - c
        denom = b - a * cp_prev
        cp_prev = c / denom
        cp_ref[0, k, :] = cp_prev
        for ch in range(channels):
            dp_prev[ch] = (f_ref[ch, k, :] - a * dp_prev[ch]) / denom
            dp_ref[ch, k, :] = dp_prev[ch]
    carry_ref[0] = cp_prev
    for ch in range(channels):
        carry_ref[1 + ch] = dp_prev[ch]


def _fgs_bwd_kernel(cp_ref, dp_ref, u_ref, carry_ref, *, s_blk, channels):
    """Back substitution (reverse grid): u[s] = dp[s] - cp[s] * u[s+1]."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    u_next = [carry_ref[c] for c in range(channels)]
    for k in range(s_blk - 1, -1, -1):
        cp = cp_ref[0, k, :]
        for ch in range(channels):
            u_next[ch] = dp_ref[ch, k, :] - cp * u_next[ch]
            u_ref[ch, k, :] = u_next[ch]
    for ch in range(channels):
        carry_ref[ch] = u_next[ch]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fgs_solve_pallas(f: jnp.ndarray, wp: jnp.ndarray, wn: jnp.ndarray,
                     lam: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Solve (I + lam*A) u = f along axis 1 of a (C, S, N) slab.

    ``wp``/``wn`` (1, S, N): edge weights to the scan-order
    predecessor/successor (wp[0] = wn[S-1] = 0 — the Neumann boundary of
    ``ops.wls._tridiagonal_smooth_rows``). ``lam`` is a traced scalar
    (rides in SMEM, so all FGS iterations share two compiled kernels).
    """
    C, S, N = f.shape
    n_sblocks = _cdiv(S, S_BLK)
    pad_s = n_sblocks * S_BLK - S
    tile_n = min(_cdiv(N, 128) * 128, 4096)
    n_tiles = _cdiv(N, tile_n)
    pad_n = n_tiles * tile_n - N
    if pad_s or pad_n:
        # zero-padded rows decouple (a = c = 0 -> denom = 1, cp = 0), so
        # the carry chain crosses the padding unchanged in both sweeps
        f = jnp.pad(f, ((0, 0), (0, pad_s), (0, pad_n)))
        wp = jnp.pad(wp, ((0, 0), (0, pad_s), (0, pad_n)))
        wn = jnp.pad(wn, ((0, 0), (0, pad_s), (0, pad_n)))
    lam_arr = jnp.asarray(lam, jnp.float32).reshape(1, 1)

    def fwd_idx(n, s):
        return (0, s, n)

    def rev_idx(n, s):
        return (0, n_sblocks - 1 - s, n)

    w_spec = pl.BlockSpec((1, S_BLK, tile_n), fwd_idx,
                          memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((C, S_BLK, tile_n), fwd_idx,
                          memory_space=pltpu.VMEM)
    lam_spec = pl.BlockSpec((1, 1), lambda n, s: (0, 0),
                            memory_space=pltpu.SMEM)
    Sp, Np = f.shape[1], f.shape[2]
    cp, dp = pl.pallas_call(
        functools.partial(_fgs_fwd_kernel, s_blk=S_BLK, channels=C),
        grid=(n_tiles, n_sblocks),
        in_specs=[lam_spec, w_spec, w_spec, f_spec],
        out_specs=(w_spec, f_spec),
        out_shape=(jax.ShapeDtypeStruct((1, Sp, Np), jnp.float32),
                   jax.ShapeDtypeStruct((C, Sp, Np), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((1 + C, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(lam_arr, wp, wn, f)

    w_rev = pl.BlockSpec((1, S_BLK, tile_n), rev_idx, memory_space=pltpu.VMEM)
    f_rev = pl.BlockSpec((C, S_BLK, tile_n), rev_idx, memory_space=pltpu.VMEM)
    u = pl.pallas_call(
        functools.partial(_fgs_bwd_kernel, s_blk=S_BLK, channels=C),
        grid=(n_tiles, n_sblocks),
        in_specs=[w_rev, f_rev],
        out_specs=f_rev,
        out_shape=jax.ShapeDtypeStruct((C, Sp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(cp, dp)
    if pad_s or pad_n:
        u = u[:, :S, :N]
    return u


def _scan_weights(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(S-1, N) between-row weights -> ((1,S,N) wp, (1,S,N) wn)."""
    z = jnp.zeros((1, w.shape[1]), jnp.float32)
    wp = jnp.concatenate([z, w], axis=0)[None]
    wn = jnp.concatenate([w, z], axis=0)[None]
    return wp, wn


@functools.partial(jax.jit, static_argnames=("num_iter", "interpret"))
def fast_global_smoother_pallas(srcs: jnp.ndarray, guide: jnp.ndarray,
                                lmbda, sigma_color, num_iter: int = 3,
                                interpret: bool = False) -> jnp.ndarray:
    """Edge-aware smoothing of C stacked maps (C, H, W), shared guide.

    Same math as running ``ops.wls.fast_global_smoother`` on each
    channel (same lambda schedule, same solve order: rows then columns
    per iteration); equal up to FMA-fusion ulps per solve.
    """
    u = jnp.asarray(srcs, jnp.float32)
    g = jnp.asarray(guide, jnp.float32)
    sig = jnp.asarray(sigma_color, jnp.float32)
    wx = jnp.exp(-jnp.abs(jnp.diff(g, axis=1)) / sig)   # (H, W-1)
    wy = jnp.exp(-jnp.abs(jnp.diff(g, axis=0)) / sig)   # (H-1, W)
    # row solve runs in (C, W, H) scan layout: S = W on sublanes, H lanes
    wxp, wxn = _scan_weights(jnp.swapaxes(wx, 0, 1))
    wyp, wyn = _scan_weights(wy)
    lmbda = jnp.asarray(lmbda, jnp.float32)
    lam_base = jnp.float32(1.5) * lmbda / (4.0 ** num_iter - 1.0)
    for t in range(num_iter):
        lam_t = lam_base * (4.0 ** (num_iter - t - 1))
        uT = jnp.swapaxes(u, 1, 2)
        uT = fgs_solve_pallas(uT, wxp, wxn, lam_t, interpret=interpret)
        u = jnp.swapaxes(uT, 1, 2)
        u = fgs_solve_pallas(u, wyp, wyn, lam_t, interpret=interpret)
    return u
