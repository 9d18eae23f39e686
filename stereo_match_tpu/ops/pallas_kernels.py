"""Pallas TPU kernels for the SGM hot path.

The XLA ``lax.scan`` SGM (``ops/sgm.py``) is dispatch-bound: ~40 us/step
against ~2 us of HBM traffic per step. This kernel expresses the same
canonical scan as a Mosaic grid — grid = (N tiles, S steps), S sequential —
so the cost slabs stream HBM->VMEM double-buffered while the carry lives in
a VMEM scratch register across steps. Scan *reversal is free* (the S index
map flips), and the running total is accumulated in-place via
input/output aliasing, so 8-direction aggregation costs ~3 volume passes of
traffic per direction instead of materializing 8 volumes.

Layout contract (framework-canonical): volumes are (D, S, N) planes — the
scanned axis S in the middle, the vectorized axis N on lanes, disparity D
on sublanes/major. See ``ops/sgm.py`` for the math and the boundary-reset
property the shear trick relies on.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


VMEM_LIMIT = 100 * 2 ** 20   # raised scoped-VMEM cap (v5e has headroom
                             # well past the 16 MB default; measured)


def _fit_tile_n(requested: int, N: int, D: int, s_blk: int, itemsize: int,
                n_bufs: int, n_scratch: int,
                budget: int = 44 * 2 ** 20) -> int:
    """Largest multiple-of-128 tile_n <= requested that fits scoped VMEM.

    Footprint model: ``n_bufs`` double-buffered (D, s_blk, tile_n) blocks
    plus ``n_scratch`` (D, tile_n) carry scratches, plus — for int16
    storage — one block-sized f32 stack copy per stream (the kernels widen
    whole blocks to f32 values, see ``_widen``/``_sgm_scan_kernel``). The
    remainder of the 16 MB scoped-VMEM limit is headroom for loop
    temporaries. Hardware calibration: 6 f32 buffers at tile_n=512
    (12.8 MB) compile and hit 33 fps; the f32 fused-stats variant at the
    same tile OOMed at 22.5 MB; int16 scan3-accum compiles at tile 256 and
    OOMs at 384.
    """
    per_128 = (n_bufs * 2 * D * s_blk + n_scratch * D) * 128 * itemsize
    if itemsize == 2:
        per_128 += n_bufs * D * s_blk * 128 * 4
    cap = max(budget // per_128, 1) * 128
    if itemsize == 2:
        # int16 block-widen kernels spill far more than the model captures
        # and reuse stack slots inconsistently between variants (measured:
        # scan3-accum compiles at tile 256; init-scan OOMs at 256 with a
        # 20.7 MB stack). Empirical caps per variant:
        cap = min(cap, 256 if n_bufs >= 3 else 128)
    full = _cdiv(N, 128) * 128
    # Prefer one full-width tile whenever the budget allows, even above
    # ``requested``: a single tile makes the fused diagonal scans
    # seam-free (no carry resets at internal lane-tile boundaries).
    if itemsize == 4 and full <= cap:
        return full
    cap = max(128, min(requested, cap, full))
    # among fitting tiles, minimize the padded extent n_tiles * tile_n —
    # the kernels do real work on pad lanes (at KITTI W=1242 the 512 cap
    # pads to 1536 while 256 pads to 1280: 17% of every pass wasted);
    # tie-break toward the larger tile (fewer grid steps / carry resets)
    best = cap
    for t in range(cap, 127, -128):
        if _cdiv(N, t) * t < _cdiv(N, best) * best:
            best = t
    return best


def _big_for(dtype):
    """Sentinel larger than any reachable path cost for the dtype."""
    return 2 ** 28 if jnp.issubdtype(dtype, jnp.integer) else 1e9


def _widen(x):
    """int16 memory -> float32 registers; floats/ints pass through.

    Mosaic has no int16 min/reduce, so int16 volumes must widen in
    registers. float32 (not int32) because (a) it is exact for the bounded
    SGM totals (config validates num_paths*(1024+P2) < 2^15 << 2^24) and
    (b) the unrolled scan kernels' int32 register chains defeat Mosaic's
    stack-slot reuse — the int16 scan3 allocated 103 MB of scoped-VMEM
    stack at KITTI shape while the equivalent f32 chain fits comfortably.
    """
    return x.astype(jnp.float32) if x.dtype == jnp.int16 else x


def _sgm_step(c, carry, p1, p2):
    """The SGM recurrence on one (D, TILE_N) register slab (f32 or i32).

    The d±1 neighbor reads are sublane rolls + edge masks (not concats:
    Mosaic cannot lower shift-concats between operands whose layouts carry
    different minor offsets — see ``_sgm_step3``).
    """
    dt = carry.dtype
    big = jnp.asarray(_big_for(dt), dt)
    p1 = jnp.asarray(p1, dt)
    p2 = jnp.asarray(p2, dt)
    D = carry.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, carry.shape, 0)
    pmin = jnp.min(carry, axis=0, keepdims=True)                 # (1, TILE_N)
    up = jnp.where(row == 0, big, pltpu.roll(carry, 1, axis=0))
    dn = jnp.where(row == D - 1, big, pltpu.roll(carry, D - 1, axis=0))
    m = jnp.minimum(jnp.minimum(carry, pmin + p2), jnp.minimum(up, dn) + p1)
    return c + m - pmin


def _sgm_scan_kernel(*refs, p1, p2, s_blk, reverse, has_acc, has_init,
                     has_cout, last_s):
    """Unified single-direction scan kernel.

    Each grid step advances the recurrence through ``s_blk`` rows of the
    block (unrolled; the carry stays in int32/f32 registers between
    sub-rows and round-trips through the scratch in the storage dtype).
    Optional refs (keyword-selected): ``acc`` adds a running total (aliased
    in-place), ``init`` seeds the carry at the first step (cross-shard
    chaining, parallel/tiling.py), ``cout`` emits the final carry.
    """
    it = iter(refs)
    c_ref = next(it)
    acc_ref = next(it) if has_acc else None
    init_ref = next(it) if has_init else None
    out_ref = next(it)
    cout_ref = next(it) if has_cout else None
    carry_ref = next(it)

    @pl.when(pl.program_id(1) == 0)
    def _():
        carry_ref[:] = init_ref[:] if has_init else jnp.zeros_like(carry_ref)

    # int16 blocks: widen ONCE and store ONCE at block granularity. Per-row
    # int16 loads/stores carry sub-word sublane offsets that defeat
    # Mosaic's stack-slot reuse (measured 103 MB scoped stack at KITTI
    # shape vs a comfortable fit for the identical f32 kernel).
    blockwise = c_ref.dtype == jnp.int16
    cf = _widen(c_ref[:]) if blockwise else None
    af = _widen(acc_ref[:]) if (blockwise and has_acc) else None
    carry = _widen(carry_ref[:])
    rows = range(s_blk - 1, -1, -1) if reverse else range(s_blk)
    outs = {}
    for k in rows:
        c_k = cf[:, k, :] if blockwise else _widen(c_ref[:, k, :])
        carry = _sgm_step(c_k, carry, p1, p2)
        if blockwise:
            outs[k] = (af[:, k, :] + carry) if has_acc else carry
        elif has_acc:
            out_ref[:, k, :] = acc_ref[:, k, :] + carry.astype(out_ref.dtype)
        else:
            out_ref[:, k, :] = carry.astype(out_ref.dtype)
    if blockwise:
        out_ref[:] = jnp.stack([outs[k] for k in range(s_blk)],
                               axis=1).astype(out_ref.dtype)
    carry_ref[:] = carry.astype(carry_ref.dtype)
    if has_cout:
        @pl.when(pl.program_id(1) == last_s)
        def _():
            cout_ref[:] = carry.astype(cout_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("p1", "p2", "reverse", "tile_n",
                                    "return_carry", "interpret"))
def sgm_scan_pallas(cost: jnp.ndarray, accum: jnp.ndarray | None,
                    p1: float, p2: float, reverse: bool = False,
                    tile_n: int = 640,
                    init_carry: jnp.ndarray | None = None,
                    return_carry: bool = False,
                    interpret: bool = False):
    """Scan along axis 1 of (D, S, N), adding into ``accum`` (aliased).

    ``reverse`` scans bottom-up (the S index map flips — no data movement).
    ``accum=None`` initializes the total (out = L, no accumulator read).
    ``init_carry`` (D, N) seeds the recurrence's incoming state (the carry
    of the scan-order-previous row shard); ``return_carry`` additionally
    returns the (D, N) carry after the final row — together these chain the
    scan across row shards bit-exactly (``parallel/tiling.py``).
    ``return_carry`` requires S to be a multiple of the sublane block (8
    f32 / 16 int16): zero-padded tail rows preserve a *zero* carry but
    corrupt a non-trivial one.
    """
    D, S, N = cost.shape
    s_blk = 8 if cost.dtype.itemsize == 4 else 16   # sublane tile per dtype
    if return_carry and S % s_blk:
        raise ValueError(f"return_carry needs S % {s_blk} == 0, got S={S}")
    tile_n = _fit_tile_n(tile_n, N, D, s_blk, cost.dtype.itemsize,
                         n_bufs=2 if accum is None else 3,
                         n_scratch=1 + (init_carry is not None)
                         + 2 * return_carry)
    n_tiles = _cdiv(N, tile_n)
    pad_n = n_tiles * tile_n - N
    n_sblocks = _cdiv(S, s_blk)
    pad_s = n_sblocks * s_blk - S
    # Zero padding is semantically free: zero-cost cells keep the carry's
    # reset property (N columns are independent; leading/trailing zero rows
    # produce zero L which is exactly the no-predecessor state).
    if pad_n or pad_s:
        pads = ((0, 0), (0, pad_s), (0, pad_n))
        cost = jnp.pad(cost, pads)
        if accum is not None:
            accum = jnp.pad(accum, pads)
        if init_carry is not None and pad_n:
            init_carry = jnp.pad(init_carry, ((0, 0), (0, pad_n)))

    def idx(n, s):
        return (0, (n_sblocks - 1 - s) if reverse else s, n)

    spec = pl.BlockSpec((D, s_blk, tile_n), idx, memory_space=pltpu.VMEM)
    carry_spec = pl.BlockSpec((D, tile_n), lambda n, s: (0, n),
                              memory_space=pltpu.VMEM)
    operands = [cost]
    in_specs = [spec]
    aliases = {}
    if accum is not None:
        operands.append(accum)
        in_specs.append(spec)
        aliases = {1: 0}
    if init_carry is not None:
        operands.append(init_carry.astype(cost.dtype))
        in_specs.append(carry_spec)
    out_specs: Any = spec
    out_shape: Any = jax.ShapeDtypeStruct(cost.shape, cost.dtype)
    if return_carry:
        out_specs = (spec, carry_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((D, cost.shape[2]), cost.dtype))
    out = pl.pallas_call(
        functools.partial(_sgm_scan_kernel, p1=float(p1), p2=float(p2),
                          s_blk=s_blk, reverse=reverse,
                          has_acc=accum is not None,
                          has_init=init_carry is not None,
                          has_cout=return_carry, last_s=n_sblocks - 1),
        grid=(n_tiles, n_sblocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((D, tile_n), cost.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
    if return_carry:
        vol, cout = out
        return vol[:, :S, :N], cout[:, :N]
    if pad_n or pad_s:
        out = out[:, :S, :N]
    return out


def _sgm_step3(c, cs, cse, csw, p1, p2):
    """One row of the fused 3-direction (S, SE, SW) recurrence.

    The SE carry is the previous row's SE state shifted one lane right
    (predecessor (y-1, x-1)); zeros shift in at the frame edge, which is
    exactly the recurrence's reset state. Likewise SW shifts left. Note the
    same trick makes W-tile boundaries behave as frame edges for the
    diagonal paths — see ``sgm_aggregate_pallas(exact_diagonals=...)``.
    """
    # Lane shifts via roll + edge mask, never concatenate: Mosaic cannot
    # lower the lane-shift concat whenever an operand's layout carries a
    # sublane offset ("offset mismatch on non-concat dimension") — i32
    # carries hit this in round 1, and f32 carries widened from int16
    # blocks (odd-row loads) hit it on hardware too.
    n = cse.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, cse.shape, 1)
    zero = jnp.zeros((), cse.dtype)
    cse_sh = jnp.where(col == 0, zero, pltpu.roll(cse, 1, axis=1))
    csw_sh = jnp.where(col == n - 1, zero, pltpu.roll(csw, n - 1, axis=1))
    Ls = _sgm_step(c, cs, p1, p2)
    Lse = _sgm_step(c, cse_sh, p1, p2)
    Lsw = _sgm_step(c, csw_sh, p1, p2)
    return Ls, Lse, Lsw


def _sgm_scan3_kernel(*refs, p1, p2, s_blk, reverse, has_acc, has_init,
                      has_cout, last_s):
    """Unified fused 3-direction (S/SE/SW or, reversed, N/NE/NW) kernel.

    Optional refs as in ``_sgm_scan_kernel``; the carry init/out slabs are
    (3, D, TILE_N) — vertical, SE, SW — in the *unshifted* representation
    (the lane shift belongs to the consuming row's step), so chaining them
    across row shards reproduces the single-chip kernel bit-exactly at
    matching tile_n (``parallel/tiling.py``).
    """
    it = iter(refs)
    c_ref = next(it)
    acc_ref = next(it) if has_acc else None
    init_ref = next(it) if has_init else None
    out_ref = next(it)
    cout_ref = next(it) if has_cout else None
    cs_ref = next(it)
    cse_ref = next(it)
    csw_ref = next(it)

    @pl.when(pl.program_id(1) == 0)
    def _():
        if has_init:
            cs_ref[:] = init_ref[0]
            cse_ref[:] = init_ref[1]
            csw_ref[:] = init_ref[2]
        else:
            cs_ref[:] = jnp.zeros_like(cs_ref)
            cse_ref[:] = jnp.zeros_like(cse_ref)
            csw_ref[:] = jnp.zeros_like(csw_ref)
    # int16: block-granular widen/store (see _sgm_scan_kernel)
    blockwise = c_ref.dtype == jnp.int16
    cf = _widen(c_ref[:]) if blockwise else None
    af = _widen(acc_ref[:]) if (blockwise and has_acc) else None
    cs, cse, csw = (_widen(cs_ref[:]), _widen(cse_ref[:]),
                    _widen(csw_ref[:]))
    rows = range(s_blk - 1, -1, -1) if reverse else range(s_blk)
    outs = {}
    for k in rows:
        c_k = cf[:, k, :] if blockwise else _widen(c_ref[:, k, :])
        cs, cse, csw = _sgm_step3(c_k, cs, cse, csw, p1, p2)
        if blockwise:
            outs[k] = (af[:, k, :] if has_acc else 0) + (cs + cse + csw)
        else:
            tot = (cs + cse + csw).astype(out_ref.dtype)
            if has_acc:
                out_ref[:, k, :] = acc_ref[:, k, :] + tot
            else:
                out_ref[:, k, :] = tot
    if blockwise:
        out_ref[:] = jnp.stack([outs[k] for k in range(s_blk)],
                               axis=1).astype(out_ref.dtype)
    cs_ref[:] = cs.astype(cs_ref.dtype)
    cse_ref[:] = cse.astype(cse_ref.dtype)
    csw_ref[:] = csw.astype(csw_ref.dtype)
    if has_cout:
        @pl.when(pl.program_id(1) == last_s)
        def _():
            cout_ref[0] = cs.astype(cout_ref.dtype)
            cout_ref[1] = cse.astype(cout_ref.dtype)
            cout_ref[2] = csw.astype(cout_ref.dtype)


def _wta_stats_rows(tot, d_iota):
    """Per-row WTA statistics of a (D, TILE_N) float32 total slab.

    Same math as ``_wta_stats_kernel`` (bit-identical outputs, tested):
    winner cost/index, the d±1 neighbor costs, and the best cost outside
    the winner's ±1 neighborhood.
    """
    D = tot.shape[0]
    big = jnp.float32(3e9)
    best = jnp.min(tot, axis=0)
    idx = jnp.min(jnp.where(tot == best[None], d_iota, D), axis=0)
    idx = idx.astype(jnp.int32)
    is_m1 = d_iota == (idx - 1)[None]
    is_p1 = d_iota == (idx + 1)[None]
    near = jnp.abs(d_iota - idx[None]) <= 1
    c0 = jnp.min(jnp.where(is_m1, tot, big), axis=0)
    c2 = jnp.min(jnp.where(is_p1, tot, big), axis=0)
    second = jnp.min(jnp.where(near, big, tot), axis=0)
    return best, idx, c0, c2, second


def _sgm_scan3_kernel_accum_stats(c_ref, acc_ref, out_ref, best_ref, idx_ref,
                                  c0_ref, c2_ref, second_ref, *rest,
                                  p1, p2, s_blk, reverse, rwta, w_true):
    """Reverse fused scan that ALSO emits the final WTA statistics.

    The reverse 3-direction pass is the last time the full aggregated
    total passes through registers — reducing it to the five per-pixel
    stats maps here saves the separate ``wta_stats_pallas`` volume read.

    ``rwta`` (full-width single-N-tile only): additionally emits the
    RIGHT-view WTA index per pixel. The sheared readout
    ``sheared[d, xr] = tot[d, xr + d]`` is produced in-register by a
    7-step masked log-roll over lanes (roll by n-b where bit b of d is
    set) and reduced to its argmin — removing the separate
    ``right_wta_pallas`` pass that re-read the whole aggregated volume
    from HBM for the disp12 LR check (~3 ms/frame at KITTI shape).
    """
    it = iter(rest)
    ridx_ref = next(it) if rwta else None
    cs_ref = next(it)
    cse_ref = next(it)
    csw_ref = next(it)
    @pl.when(pl.program_id(1) == 0)
    def _():
        cs_ref[:] = jnp.zeros_like(cs_ref)
        cse_ref[:] = jnp.zeros_like(cse_ref)
        csw_ref[:] = jnp.zeros_like(csw_ref)
    cs, cse, csw = (_widen(cs_ref[:]), _widen(cse_ref[:]),
                    _widen(csw_ref[:]))
    rows = range(s_blk - 1, -1, -1) if reverse else range(s_blk)
    d_iota = None
    # Stats accumulate into (s_blk, tile_n) registers via a row-select so
    # each loop iteration's temporaries die immediately (an end-of-block
    # jnp.stack kept 5*s_blk values live and blew the VMEM stack budget
    # on hardware — BENCH_r01 OOM).
    tile = (s_blk,) + c_ref.shape[2:]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, tile, 0)
    best_a = jnp.zeros(tile, jnp.float32)
    idx_a = jnp.zeros(tile, jnp.int32)
    c0_a = jnp.zeros(tile, jnp.float32)
    c2_a = jnp.zeros(tile, jnp.float32)
    second_a = jnp.zeros(tile, jnp.float32)
    ridx_a = jnp.zeros(tile, jnp.int32) if rwta else None
    col_iota = None
    for k in rows:
        cs, cse, csw = _sgm_step3(_widen(c_ref[:, k, :]), cs, cse, csw, p1, p2)
        tot = _widen(acc_ref[:, k, :]) + (cs + cse + csw)
        out_ref[:, k, :] = tot.astype(out_ref.dtype)
        totf = tot.astype(jnp.float32)
        if d_iota is None:
            d_iota = jax.lax.broadcasted_iota(jnp.int32, totf.shape, 0)
            if rwta:
                col_iota = jax.lax.broadcasted_iota(jnp.int32, totf.shape, 1)
        at_k = row_iota == k
        if rwta:
            # right-view argmin FIRST so the sheared slab dies before the
            # stats temporaries go live (VMEM-stack discipline, see the
            # BENCH_r01 note above)
            n = totf.shape[1]
            D = totf.shape[0]
            sheared = totf
            b = 1
            while b < D:
                rolled = pltpu.roll(sheared, n - b, axis=1)
                sheared = jnp.where((d_iota & b) != 0, rolled, sheared)
                b *= 2
            big = jnp.float32(3e9)
            sheared = jnp.where(col_iota + d_iota < w_true, sheared, big)
            rmin = jnp.min(sheared, axis=0)
            ridx = jnp.min(jnp.where(sheared == rmin[None], d_iota, D),
                           axis=0).astype(jnp.int32)
            ridx_a = jnp.where(at_k, ridx[None], ridx_a)
        best, idx, c0, c2, second = _wta_stats_rows(totf, d_iota)
        best_a = jnp.where(at_k, best[None], best_a)
        idx_a = jnp.where(at_k, idx[None], idx_a)
        c0_a = jnp.where(at_k, c0[None], c0_a)
        c2_a = jnp.where(at_k, c2[None], c2_a)
        second_a = jnp.where(at_k, second[None], second_a)
    cs_ref[:] = cs.astype(cs_ref.dtype)
    cse_ref[:] = cse.astype(cse_ref.dtype)
    csw_ref[:] = csw.astype(csw_ref.dtype)
    best_ref[0] = best_a
    idx_ref[0] = idx_a
    c0_ref[0] = c0_a
    c2_ref[0] = c2_a
    second_ref[0] = second_a
    if rwta:
        ridx_ref[0] = ridx_a


@functools.partial(jax.jit,
                   static_argnames=("p1", "p2", "reverse", "tile_n",
                                    "interpret"))
def sgm_scan3_stats_pallas(cost: jnp.ndarray, accum: jnp.ndarray,
                           p1: float, p2: float, reverse: bool = True,
                           tile_n: int = 640, interpret: bool = False):
    """Final fused S/SE/SW (reversed: N/NE/NW) pass + WTA statistics.

    Returns ``(total, best, idx, c0, c2, second[, right_idx])`` — the
    aggregated volume (aliased into ``accum``) plus the per-pixel maps
    that ``wta_stats_pallas`` would otherwise re-read the volume to
    compute. When the width fits ONE N-tile (full-width KITTI does), a
    sixth map carries the RIGHT-view WTA index so the disp12 LR check
    skips the separate ``right_wta_pallas`` volume read; with multiple
    N-tiles the sheared readout would cross tiles, so the map is omitted
    and callers fall back.
    """
    D, S, N = cost.shape
    s_blk = 8 if cost.dtype.itemsize == 4 else 16
    # The stats reduction needs ~1.7x the model's stack estimate (22.5 MB
    # at tile 512 measured round 2); with the raised vmem_limit_bytes a
    # 34 MB model budget admits the full-width 1280 tile (~56 MB real).
    tile_n = _fit_tile_n(tile_n, N, D, s_blk, cost.dtype.itemsize,
                         n_bufs=3, n_scratch=3, budget=34 * 2 ** 20)
    n_tiles = _cdiv(N, tile_n)
    rwta = n_tiles == 1 and cost.dtype != jnp.int16
    pad_n = n_tiles * tile_n - N
    n_sblocks = _cdiv(S, s_blk)
    pad_s = n_sblocks * s_blk - S
    if pad_n or pad_s:
        pads = ((0, 0), (0, pad_s), (0, pad_n))
        cost = jnp.pad(cost, pads)
        accum = jnp.pad(accum, pads)

    def idx(n, s):
        return (0, (n_sblocks - 1 - s) if reverse else s, n)

    spec = pl.BlockSpec((D, s_blk, tile_n), idx, memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((1, s_blk, tile_n), idx, memory_space=pltpu.VMEM)
    Sp, Np = cost.shape[1], cost.shape[2]
    n_maps = 6 if rwta else 5
    map_dts = [jnp.float32, jnp.int32, jnp.float32, jnp.float32,
               jnp.float32] + ([jnp.int32] if rwta else [])
    out_shapes = (
        jax.ShapeDtypeStruct(cost.shape, cost.dtype),     # total (aliased)
    ) + tuple(jax.ShapeDtypeStruct((1, Sp, Np), dt) for dt in map_dts)
    outs = pl.pallas_call(
        functools.partial(_sgm_scan3_kernel_accum_stats, p1=float(p1),
                          p2=float(p2), s_blk=s_blk, reverse=reverse,
                          rwta=rwta, w_true=N),
        grid=(n_tiles, n_sblocks),
        in_specs=[spec, spec],
        out_specs=(spec,) + (map_spec,) * n_maps,
        out_shape=out_shapes,
        input_output_aliases={1: 0},
        scratch_shapes=[pltpu.VMEM((D, tile_n), cost.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(cost, accum)
    total = outs[0][:, :S, :N]
    maps = tuple(o[0, :S, :N] for o in outs[1:])
    return (total,) + maps


@functools.partial(jax.jit,
                   static_argnames=("p1", "p2", "reverse", "tile_n",
                                    "return_carry", "interpret"))
def sgm_scan3_pallas(cost: jnp.ndarray, accum: jnp.ndarray | None,
                     p1: float, p2: float, reverse: bool = False,
                     tile_n: int = 640,
                     init_carry: jnp.ndarray | None = None,
                     return_carry: bool = False,
                     interpret: bool = False):
    """Fused S+SE+SW (or, reversed, N+NE+NW) scan over (D, S, N).

    One volume pass computes three path directions; diagonal carries are
    lane-shifted vertical carries. W-tile boundaries reset the diagonal
    carries (frame-edge semantics); use ``tile_n >= N`` for boundary-free
    results when VMEM allows.

    ``init_carry``/``return_carry`` move the (3, D, N) carry slab —
    vertical, SE, SW, unshifted — in/out of the scan, chaining it across
    row shards bit-exactly (including both diagonals: the per-row lane
    shift happens inside the consuming step, so the slab needs no
    re-anchoring). ``return_carry`` requires S % s_blk == 0.
    """
    D, S, N = cost.shape
    s_blk = 8 if cost.dtype.itemsize == 4 else 16
    if return_carry and S % s_blk:
        raise ValueError(f"return_carry needs S % {s_blk} == 0, got S={S}")
    tile_n = _fit_tile_n(tile_n, N, D, s_blk, cost.dtype.itemsize,
                         n_bufs=2 if accum is None else 3,
                         n_scratch=3 + 3 * (init_carry is not None)
                         + 6 * return_carry)
    n_tiles = _cdiv(N, tile_n)
    pad_n = n_tiles * tile_n - N
    n_sblocks = _cdiv(S, s_blk)
    pad_s = n_sblocks * s_blk - S
    if pad_n or pad_s:
        pads = ((0, 0), (0, pad_s), (0, pad_n))
        cost = jnp.pad(cost, pads)
        if accum is not None:
            accum = jnp.pad(accum, pads)
        if init_carry is not None and pad_n:
            init_carry = jnp.pad(init_carry, ((0, 0), (0, 0), (0, pad_n)))

    def idx(n, s):
        return (0, (n_sblocks - 1 - s) if reverse else s, n)

    spec = pl.BlockSpec((D, s_blk, tile_n), idx, memory_space=pltpu.VMEM)
    carry_spec = pl.BlockSpec((3, D, tile_n), lambda n, s: (0, 0, n),
                              memory_space=pltpu.VMEM)
    operands = [cost]
    in_specs = [spec]
    aliases = {}
    if accum is not None:
        operands.append(accum)
        in_specs.append(spec)
        aliases = {1: 0}
    if init_carry is not None:
        operands.append(init_carry.astype(cost.dtype))
        in_specs.append(carry_spec)
    out_specs: Any = spec
    out_shape: Any = jax.ShapeDtypeStruct(cost.shape, cost.dtype)
    if return_carry:
        out_specs = (spec, carry_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((3, D, cost.shape[2]), cost.dtype))
    out = pl.pallas_call(
        functools.partial(_sgm_scan3_kernel, p1=float(p1), p2=float(p2),
                          s_blk=s_blk, reverse=reverse,
                          has_acc=accum is not None,
                          has_init=init_carry is not None,
                          has_cout=return_carry, last_s=n_sblocks - 1),
        grid=(n_tiles, n_sblocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((D, tile_n), cost.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
    if return_carry:
        vol, cout = out
        return vol[:, :S, :N], cout[:, :, :N]
    if pad_n or pad_s:
        out = out[:, :S, :N]
    return out


@functools.partial(jax.jit, static_argnames=("p1", "p2", "num_paths",
                                             "interpret"))
def sgm_aggregate_pallas(cost: jnp.ndarray, p1: float, p2: float,
                         num_paths: int = 8,
                         cost_T: jnp.ndarray | None = None,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused 2/4/8-path SGM aggregation (Pallas fast path).

    Four volume passes total for 8 paths: a transpose pair of plain scans
    for the horizontal directions, and a fwd/rev pair of *fused* scans for
    vertical + both diagonals (three carries per pass, diagonals as
    lane-shifted carries — no shear gathers). Bit-identical to
    ``ops.sgm.sgm_aggregate`` whenever W fits one N-tile — which, with
    the raised VMEM budget, includes full KITTI width (tile 1280 >=
    W=1242; tests/test_pallas.py::test_full_kitti_width_bit_parity). For
    still-wider volumes, internal N-tile boundaries act as frame edges
    for the *diagonal* paths only (quality-tested).
    """
    if num_paths not in (2, 4, 8):
        raise ValueError("num_paths must be 2, 4 or 8")
    cost = jnp.asarray(cost)
    if cost.dtype not in (jnp.float32, jnp.int16):
        cost = cost.astype(jnp.float32)
    kw = dict(p1=p1, p2=p2, interpret=interpret)

    # horizontal (0,±1): scan over W on the (D, W, H) volume. Passing a
    # pre-built ``cost_T`` (census_volume_T_pallas) skips a 2x-volume
    # HBM transpose here.
    volT = jnp.swapaxes(cost, 1, 2) if cost_T is None else cost_T
    tot_T = sgm_scan_pallas(volT, None, reverse=False, **kw)
    tot_T = sgm_scan_pallas(volT, tot_T, reverse=True, **kw)
    total = jnp.swapaxes(tot_T, 1, 2)
    if num_paths == 2:
        return total

    if num_paths == 4:
        total = sgm_scan_pallas(cost, total, reverse=False, **kw)
        total = sgm_scan_pallas(cost, total, reverse=True, **kw)
        return total

    # 8-path: fused S+SE+SW down-pass and N+NE+NW up-pass
    total = sgm_scan3_pallas(cost, total, reverse=False, **kw)
    total = sgm_scan3_pallas(cost, total, reverse=True, **kw)
    return total


@functools.partial(jax.jit, static_argnames=("p1", "p2", "num_paths",
                                             "min_disparity", "interpret"))
def sgm_aggregate_wta_pallas(cost: jnp.ndarray, p1: float, p2: float,
                             num_paths: int = 8,
                             cost_T: jnp.ndarray | None = None,
                             census_T=None, min_disparity: int = 0,
                             interpret: bool = False):
    """Aggregation with the WTA statistics fused into the last pass.

    Returns ``(total, (best, idx, c0, c2, second))`` — semantically
    ``(sgm_aggregate_pallas(...), wta_stats_pallas(total))`` (tested
    equal) but with one fewer full-volume HBM read for the 8-path case.

    ``census_T``: optional ``(clT, crT)`` transposed census words — the
    horizontal pair then runs :func:`sgm_census_hpair_pallas` (costs
    rebuilt in-register), removing the transposed volume from HBM
    entirely (vs ``cost_T``'s prebuilt volT: ~714 MB less traffic per
    frame at KITTI shape). Bit-identical (tested).
    """
    cost = jnp.asarray(cost)
    if cost.dtype not in (jnp.float32, jnp.int16):
        cost = cost.astype(jnp.float32)
    # int16: the fused-stats reverse pass does not fit the hardware stack
    # budget at any tile (the 16-row widen + stats reduction chain); the
    # separate wta_stats pass costs one extra *half-width* volume read.
    if num_paths != 8 or cost.dtype == jnp.int16:
        total = sgm_aggregate_pallas(cost, p1, p2, num_paths, cost_T=cost_T,
                                     interpret=interpret)
        return total, wta_stats_pallas(total, interpret=interpret)
    kw = dict(p1=p1, p2=p2, interpret=interpret)
    if census_T is not None:
        clT, crT = census_T
        tot_T = sgm_census_hpair_pallas(clT, crT, cost.shape[0],
                                        min_disparity, p1, p2,
                                        interpret=interpret)
    else:
        volT = jnp.swapaxes(cost, 1, 2) if cost_T is None else cost_T
        tot_T = sgm_scan_pallas(volT, None, reverse=False, **kw)
        tot_T = sgm_scan_pallas(volT, tot_T, reverse=True, **kw)
    total = jnp.swapaxes(tot_T, 1, 2)
    total = sgm_scan3_pallas(cost, total, reverse=False, **kw)
    out = sgm_scan3_stats_pallas(cost, total, reverse=True, **kw)
    return out[0], out[1:]


# ------------------------------------------------------- cost volumes ----

def _census_words_kernel(img_ref, out_ref, *, ry, rx, wpp, s_out):
    """Census descriptor words for one view's s_out-row block.

    The XLA formulation (ops/census.py) costs ~3.7 ms/frame for both
    KITTI views — 25 dynamic-slice + compare + or passes that XLA
    materializes through HBM several times. Here each output row is
    built from 2*ry+1 single-row loads held in registers: per (dy, dx)
    neighbor one lane roll + compare + scaled add packs the bit. Lane
    coords are the padded image's (c = x + rx); the final word rolls
    left by rx so out[x] lands at lane x. Edge replication comes from
    the wrapper's edge-pad; roll wraparound only touches lanes beyond
    the valid output extent.
    """
    # NB: the input BlockSpec's index map already selects view
    # program_id(0) — the ref's leading extent is 1, so the in-kernel
    # index is 0. (Indexing by program_id(0) here passes interpret-mode
    # tests — jnp clamps the out-of-bounds 1 back to 0 — but reads
    # garbage on real hardware for the second view.)
    i = pl.program_id(1)
    row0 = i * s_out
    wh, ww = 2 * ry + 1, 2 * rx + 1
    for y in range(s_out):
        center = img_ref[0, pl.ds(row0 + y + ry, 1), :]
        word = jnp.zeros((1, wpp), jnp.int32)
        bit = 0
        for dy in range(wh):
            row = img_ref[0, pl.ds(row0 + y + dy, 1), :]
            for dx in range(ww):
                if dy == ry and dx == rx:
                    continue
                off = dx - rx
                shifted = row if off == 0 else \
                    pltpu.roll(row, (wpp - off) % wpp, axis=1)
                b = (shifted < center).astype(jnp.int32)
                word = word + b * np.int32(1 << bit)
                bit += 1
        word = pltpu.roll(word, wpp - rx, axis=1)
        out_ref[0, pl.ds(y, 1), :] = word


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def census_words_pallas(imgs: jnp.ndarray, window: tuple[int, int] = (5, 5),
                        interpret: bool = False) -> jnp.ndarray:
    """(2, H, W) images -> (2, H, W) int32 single-word census descriptors.

    Bit-identical to ``ops.census.census_transform`` (same row-major bit
    order, strict less-than, edge replication) for windows of at most 33
    pixels (one packed word — the production 5x5 uses 24 bits).
    """
    wh, ww = window
    if wh % 2 == 0 or ww % 2 == 0:
        raise ValueError("census window must be odd in both dimensions")
    if wh * ww - 1 > 32:
        raise ValueError("census_words_pallas packs one int32 word "
                         f"(window {window} needs {wh * ww - 1} bits)")
    two, H, W = imgs.shape
    if two != 2:
        raise ValueError("imgs must be (2, H, W) — both views")
    ry, rx = wh // 2, ww // 2
    s_out = 8
    nb = _cdiv(H, s_out)
    h_pad = nb * s_out + 2 * ry
    wpp = _cdiv(W + 2 * rx, 128) * 128
    imgs = jnp.asarray(imgs, jnp.float32)
    # edge-replicate exactly like ops.census (rows below H replicate the
    # last true row; the lane tail past W+2*rx is don't-care)
    imgs = jnp.pad(imgs, ((0, 0), (ry, h_pad - H - ry), (rx, wpp - W - rx)),
                   mode="edge")
    out = pl.pallas_call(
        functools.partial(_census_words_kernel, ry=ry, rx=rx, wpp=wpp,
                          s_out=s_out),
        grid=(2, nb),
        in_specs=[pl.BlockSpec((1, h_pad, wpp), lambda v, i: (v, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, s_out, wpp), lambda v, i: (v, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, H, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(imgs)
    return out


def _lr_mask_kernel(dl_ref, dr_ref, out_ref, *, d_levels, tol, w_true,
                    min_disparity):
    """Gather-free disp12 consistency mask on one row block.

    The XLA formulation (``ops.wta.lr_consistency_mask``) samples
    disp_right at per-pixel positions with ``take_along_axis`` — a lane
    gather that costs ~3.5 ms/frame at KITTI shape on TPU. Here the
    right map is rolled right one lane per step; at step s exactly the
    lanes whose rounded sampling offset x - round(x - d_L) equals s
    read their sample — pure VPU selects, bit-identical to the gather
    (same jnp.round semantics, same in-frame clip behavior: clipped
    out-of-frame lanes fail the separate inframe test regardless of the
    value read, so the roll's wraparound is harmless).
    """
    dl = dl_ref[:]
    dr = dr_ref[:]
    x = jax.lax.broadcasted_iota(jnp.int32, dl.shape, 1).astype(jnp.float32)
    r = jnp.round(x - dl)                     # sampling position (float)
    s = (x - r).astype(jnp.int32)             # integer lane shift
    ok = jnp.zeros(dl.shape, bool)
    rolled = dr
    for shift in range(d_levels + 1):
        if shift > 0:
            rolled = pltpu.roll(rolled, 1, axis=1)   # rolled[x] = dr[x-shift]
        ok = ok | ((s == shift) & (jnp.abs(dl - rolled) <= tol))
    inframe = (r >= 0) & (r < w_true)
    out_ref[:] = (ok & inframe).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("d_levels", "tol",
                                             "min_disparity", "interpret"))
def lr_mask_pallas(disp_left: jnp.ndarray, disp_right: jnp.ndarray,
                   d_levels: int, tol: int, min_disparity: int = 0,
                   interpret: bool = False) -> jnp.ndarray:
    """disp12 check |d_L(x) - d_R(x - d_L(x))| <= tol without gathers.

    Equals ``ops.wta.lr_consistency_mask`` (tested bit-exact, NaN
    invalids -> False). ``d_levels`` bounds the rolled search
    (disparities are < min_disparity + d_levels).
    """
    H, W = disp_left.shape
    s_blk = 8
    nb = _cdiv(H, s_blk)
    wpp = _cdiv(W, 128) * 128
    dl = jnp.pad(jnp.asarray(disp_left, jnp.float32),
                 ((0, nb * s_blk - H), (0, wpp - W)))
    dr = jnp.pad(jnp.asarray(disp_right, jnp.float32),
                 ((0, nb * s_blk - H), (0, wpp - W)))
    spec = pl.BlockSpec((s_blk, wpp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_lr_mask_kernel,
                          d_levels=d_levels + min_disparity,
                          tol=float(tol), w_true=W,
                          min_disparity=min_disparity),
        grid=(nb,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nb * s_blk, wpp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(dl, dr)
    return out[:H, :W].astype(bool)


def _census_vol_kernel(cl_ref, cr_ref, out_ref, *, d_levels, min_disparity):
    """(words, s_blk, Wp) census word blocks -> (D, s_blk, Wp) cost block.

    Incremental lane roll: the d-th plane's shifted right descriptor is the
    (d-1)-th rolled one more lane, so each plane costs one roll + xor +
    popcount instead of a fresh 119 MB XLA shift chain. Wrapped lanes
    (x < d) and padded lanes (x >= W) are overwritten with INVALID, exactly
    matching ``ops.cost_volume._invalid_mask`` semantics.
    """
    cl = cl_ref[:]
    cr_roll = cr_ref[:]
    if min_disparity:
        cr_roll = pltpu.roll(cr_roll, min_disparity, axis=2)
    shape = cl.shape[1:]
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    if out_ref.dtype == jnp.int16:
        invalid = jnp.full(shape, 1024, jnp.int32)
    else:
        invalid = jnp.full(shape, 1e4, jnp.float32)
    for i in range(d_levels):
        d = min_disparity + i
        if i:
            cr_roll = pltpu.roll(cr_roll, 1, axis=2)
        ham = jax.lax.population_count(jnp.bitwise_xor(cl, cr_roll))
        ham = jnp.sum(ham, axis=0)
        ham = jnp.where(col < d, invalid.astype(ham.dtype), ham)
        out_ref[i] = ham.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_disparities", "min_disparity",
                                             "dtype", "interpret"))
def census_volume_pallas(cl: jnp.ndarray, cr: jnp.ndarray,
                         num_disparities: int, min_disparity: int = 0,
                         dtype=jnp.int16,
                         interpret: bool = False) -> jnp.ndarray:
    """Census-word images (words, H, W) -> (D, H, W) Hamming cost volume.

    Pallas fast path of ``ops.cost_volume.census_cost_volume`` (bit-equal,
    tested): one pass writing the volume, right descriptors rolled
    incrementally in VMEM instead of 128 XLA strided-shift reads.
    Requires ``min_disparity >= 0``.
    """
    if min_disparity < 0:
        raise ValueError("census_volume_pallas needs min_disparity >= 0")
    nw, H, W = cl.shape
    # sublane block must be a whole tile of the *output* dtype: int16 tiles
    # are (16, 128), so 8-row int16 blocks would be tile-misaligned
    s_blk = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    wp = _cdiv(W, 128) * 128
    n_sblocks = _cdiv(H, s_blk)
    pad_s = n_sblocks * s_blk - H
    if wp - W or pad_s:
        pads = ((0, 0), (0, pad_s), (0, wp - W))
        cl = jnp.pad(cl, pads)
        cr = jnp.pad(cr, pads)
    in_spec = pl.BlockSpec((nw, s_blk, wp), lambda s: (0, s, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((num_disparities, s_blk, wp), lambda s: (0, s, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_census_vol_kernel, d_levels=num_disparities,
                          min_disparity=min_disparity),
        grid=(n_sblocks,),
        in_specs=[in_spec, in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((num_disparities, cl.shape[1], wp),
                                       jnp.dtype(dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(cl, cr)
    return out[:, :H, :W]


def _census_vol_T_kernel(clT_ref, crT_ref, out_ref, *, d_levels,
                         min_disparity, w_blk, pad_rows):
    """Transposed-layout builder: out (D, w_blk, Hp) for x-rows of clT.

    The full right descriptor image (front-padded by ``pad_rows``) sits in
    VMEM; plane d reads the (x - d) row window as one dynamic sublane
    slice — building the (D, W, H) volume for the horizontal SGM scans
    without ever transposing a volume in HBM.
    """
    x0 = pl.program_id(0) * w_blk
    cl = clT_ref[:]
    shape = cl.shape[1:]
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + x0
    if out_ref.dtype == jnp.int16:
        invalid = jnp.full(shape, 1024, jnp.int32)
    else:
        invalid = jnp.full(shape, 1e4, jnp.float32)
    for i in range(d_levels):
        d = min_disparity + i
        # Mosaic needs sublane-dim slice starts provably 8-aligned. x0 is a
        # multiple of w_blk (8 or 16); (pad_rows - d) splits into a static
        # aligned part 8*q plus a static residue r in [0, 8), so load an
        # aligned (w_blk+8)-row window and take the static r..r+w_blk slice.
        q, r = divmod(pad_rows - d, 8)
        base = pl.multiple_of(x0 + 8 * q, 8)
        slab = crT_ref[:, pl.ds(base, w_blk + 8), :][:, r:r + w_blk, :]
        ham = jax.lax.population_count(jnp.bitwise_xor(cl, slab))
        ham = jnp.sum(ham, axis=0)
        ham = jnp.where(row < d, invalid.astype(ham.dtype), ham)
        out_ref[i] = ham.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_disparities", "min_disparity",
                                             "dtype", "interpret"))
def census_volume_T_pallas(clT: jnp.ndarray, crT: jnp.ndarray,
                           num_disparities: int, min_disparity: int = 0,
                           dtype=jnp.int16,
                           interpret: bool = False) -> jnp.ndarray:
    """Transposed census words (words, W, H) -> (D, W, H) cost volume.

    Equals ``swapaxes(census_volume_pallas(...), 1, 2)`` (tested) at the
    cost of re-running the cheap popcounts instead of a 238 MB volume
    transpose; feeds the horizontal SGM pair directly.
    """
    if min_disparity < 0:
        raise ValueError("census_volume_T_pallas needs min_disparity >= 0")
    nw, W, H = clT.shape
    # int16 output tiles are (16, 128): use 16-row W blocks (see the
    # non-transposed builder); the aligned-window read below widens with it
    w_blk = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    hp = _cdiv(H, 128) * 128
    n_blocks = _cdiv(W, w_blk)
    pad_w = n_blocks * w_blk - W
    pad_rows = num_disparities - 1 + min_disparity
    clT = jnp.pad(clT, ((0, 0), (0, pad_w), (0, hp - H)))
    # front-pad the right image so x - d never reads out of bounds (the
    # pad content is masked to INVALID by the row < d test); round the
    # resident buffer's sublane extent up to the i32 tile multiple
    # +8 tail: the kernel reads aligned (w_blk+8)-row windows, which can
    # overhang the last block's w_blk-row slice by up to 8 rows
    tail = 8 + (-(pad_rows + W + pad_w) % 8)
    crT = jnp.pad(crT, ((0, 0), (pad_rows, pad_w + tail), (0, hp - H)))
    in_spec = pl.BlockSpec((nw, w_blk, hp), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((nw, crT.shape[1], hp), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((num_disparities, w_blk, hp), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_census_vol_T_kernel, d_levels=num_disparities,
                          min_disparity=min_disparity, w_blk=w_blk,
                          pad_rows=pad_rows),
        grid=(n_blocks,),
        in_specs=[in_spec, full_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((num_disparities, clT.shape[1], hp),
                                       jnp.dtype(dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(clT, crT)
    return out[:, :W, :H]


# ----------------------------------------------------------------- WTA ----

def _right_wta_kernel(c_ref, idx_ref, *, w_true, d_levels):
    """Right-view WTA over the left-anchored volume, one block pass.

    Computes argmin_d C(d, y, xr + d) for every xr without any shear or
    transpose: iterate d downward keeping the accumulator anchored at
    x = xr + d, so each step is ONE static lane shift —
    A_d(x) = min(C[d](x), A_{d+1}(x + 1)) and A_0(xr) is the answer.
    Ties keep the smallest d (<= update while descending), matching
    jnp.argmin first-occurrence semantics in the XLA reference
    (``ops.wta.right_disparity_from_volume``).
    """
    shape = c_ref.shape[1:]                      # (s_blk, Wp)
    wp = shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    big = jnp.full(shape, 2 ** 28, jnp.int32)
    oob = col >= w_true                          # x beyond the true width

    def body(i, carry):
        acc, idx = carry
        d = d_levels - 1 - i
        slab = c_ref[pl.dslice(d, 1), :, :]
        slab = _widen(slab.reshape(shape))
        if slab.dtype != jnp.int32:              # float volumes: scale-free
            slab = slab.astype(jnp.float32)
        slab = jnp.where(oob, big.astype(slab.dtype), slab)
        acc_sh = jnp.where(col == wp - 1, big.astype(acc.dtype),
                           pltpu.roll(acc, wp - 1, axis=1))
        idx_sh = pltpu.roll(idx, wp - 1, axis=1)
        upd = slab <= acc_sh
        return (jnp.where(upd, slab, acc_sh), jnp.where(upd, d, idx_sh))

    # int16 volumes widen to f32 registers (see _widen); only a true int32
    # volume keeps integer accumulation
    dt = jnp.int32 if c_ref.dtype == jnp.int32 else jnp.float32
    acc0 = big.astype(dt)
    idx0 = jnp.zeros(shape, jnp.int32)
    _, idx = jax.lax.fori_loop(0, d_levels, body, (acc0, idx0))
    idx_ref[0] = idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def right_wta_pallas(agg: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(D, H, W) volume -> right-view integer WTA disparity (H, W) int32.

    Pallas fast path of ``ops.wta.right_disparity_from_volume`` (same
    semantics, tested equivalent): one volume read, no transposes, no
    shear copies.
    """
    D, H, W = agg.shape
    s_blk = 16 if agg.dtype.itemsize == 2 else 8   # whole input-dtype tiles
    wp = _cdiv(W, 128) * 128
    n_sblocks = _cdiv(H, s_blk)
    pad_s = n_sblocks * s_blk - H
    if wp - W or pad_s:
        # pad value irrelevant: the kernel masks x >= W with a big cost
        agg = jnp.pad(agg, ((0, 0), (0, pad_s), (0, wp - W)))
    in_spec = pl.BlockSpec((D, s_blk, wp), lambda s: (0, s, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, s_blk, wp), lambda s: (0, s, 0),
                            memory_space=pltpu.VMEM)
    idx = pl.pallas_call(
        functools.partial(_right_wta_kernel, w_true=W, d_levels=D),
        grid=(n_sblocks,),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((1, agg.shape[1], wp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(agg)
    return idx[0, :H, :W]



def _wta_stats_kernel(agg_ref, best_ref, idx_ref, c0_ref, c2_ref, second_ref,
                      *, s_blk):
    """One volume read -> per-pixel WTA statistics.

    For each pixel of the (D, S_BLK, TILE_N) block: the winning cost and
    index, the costs at idx±1 (subpixel parabola inputs), and the best
    cost outside the winner's ±1 neighborhood (uniqueness test input).
    All are D-axis reductions on VPU registers — the whole WTA stage then
    needs a single pass over the volume.

    f32 blocks reduce the whole rank-3 block at once; int16 blocks widen
    once and loop rows with 2-D temporaries (rank-3 masks over a widened
    int16 block overflow the hardware stack budget).
    """
    if agg_ref.dtype != jnp.int16:
        c = agg_ref[:].astype(jnp.float32)      # (D, S_BLK, TILE_N)
        D = c.shape[0]
        d_iota = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
        big = jnp.float32(3e9)
        best = jnp.min(c, axis=0)
        # argmin with first-occurrence ties: smallest d where c == best
        idx = jnp.min(jnp.where(c == best[None], d_iota, D), axis=0)
        idx = idx.astype(jnp.int32)
        is_m1 = d_iota == (idx - 1)[None]
        is_p1 = d_iota == (idx + 1)[None]
        near = jnp.abs(d_iota - idx[None]) <= 1
        c0 = jnp.min(jnp.where(is_m1, c, big), axis=0)
        c2 = jnp.min(jnp.where(is_p1, c, big), axis=0)
        second = jnp.min(jnp.where(near, big, c), axis=0)
        best_ref[0] = best
        idx_ref[0] = idx
        c0_ref[0] = c0
        c2_ref[0] = c2
        second_ref[0] = second
        return
    cf = _widen(agg_ref[:])                     # one block-granular widen
    d_iota = None
    rows = {}
    for k in range(s_blk):
        if d_iota is None:
            d_iota = jax.lax.broadcasted_iota(jnp.int32, cf[:, k, :].shape, 0)
        rows[k] = _wta_stats_rows(cf[:, k, :], d_iota)
    for ref, j in ((best_ref, 0), (idx_ref, 1), (c0_ref, 2), (c2_ref, 3),
                   (second_ref, 4)):
        ref[0] = jnp.stack([rows[k][j] for k in range(s_blk)], axis=0)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def wta_stats_pallas(agg: jnp.ndarray, tile_n: int = 640,
                     interpret: bool = False):
    """(D, H, W) -> (best, idx, c0, c2, second) maps in one volume pass."""
    D, H, W = agg.shape
    s_blk = 16 if agg.dtype.itemsize == 2 else 8   # whole input-dtype tiles
    if agg.dtype.itemsize == 2:
        tile_n = min(tile_n, 128)   # block widen + row temps (see kernel)
    tile_n = min(tile_n, _cdiv(W, 128) * 128)
    n_tiles = _cdiv(W, tile_n)
    pad_n = n_tiles * tile_n - W
    n_sblocks = _cdiv(H, s_blk)
    pad_s = n_sblocks * s_blk - H
    if pad_n or pad_s:
        # Pad with a large *representable* cost so padded cells never win
        # the argmin (int16 volumes: 2^14 > any reachable 8-path total).
        pad_val = 2 ** 14 if jnp.issubdtype(agg.dtype, jnp.integer) else 1e9 / 4
        agg = jnp.pad(agg, ((0, 0), (0, pad_s), (0, pad_n)),
                      constant_values=jnp.asarray(pad_val, agg.dtype))

    in_spec = pl.BlockSpec((D, s_blk, tile_n), lambda n, s: (0, s, n),
                           memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((1, s_blk, tile_n), lambda n, s: (0, s, n),
                            memory_space=pltpu.VMEM)
    Hp, Wp = agg.shape[1], agg.shape[2]
    shapes = (
        jax.ShapeDtypeStruct((1, Hp, Wp), jnp.float32),   # best
        jax.ShapeDtypeStruct((1, Hp, Wp), jnp.int32),     # idx
        jax.ShapeDtypeStruct((1, Hp, Wp), jnp.float32),   # c0
        jax.ShapeDtypeStruct((1, Hp, Wp), jnp.float32),   # c2
        jax.ShapeDtypeStruct((1, Hp, Wp), jnp.float32),   # second
    )
    outs = pl.pallas_call(
        functools.partial(_wta_stats_kernel, s_blk=s_blk),
        grid=(n_tiles, n_sblocks),
        in_specs=[in_spec],
        out_specs=(map_spec,) * 5,
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(agg)
    return tuple(o[0, :H, :W] for o in outs)


def _mccnn_vol_kernel(fl_ref, fr_ref, out_ref, *, d_levels, min_disparity,
                      scale):
    """(F, s_blk, Wp) feature blocks -> (D, s_blk, Wp) MC-CNN cost block.

    Same incremental-lane-roll structure as ``_census_vol_kernel`` with
    the Hamming popcount replaced by the feature dot product: the XLA
    unrolled builder re-reads both full (F, H, W) feature maps once per
    disparity plane (~30 GB of HBM traffic at KITTI shape, ~37 ms —
    measured round 3); here each row block is read once and the 128
    planes are produced from VMEM. Cost formula matches
    ``models.mccnn.mccnn_cost_volume``: scale * (1 - <fl, fr(x-d)>) / 2,
    INVALID_COST where x < d.
    """
    fl = fl_ref[:]
    fr = fr_ref[:]
    shape = fl.shape[1:]
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    invalid = jnp.full(shape, 1e4, jnp.float32)
    if min_disparity:
        fr = pltpu.roll(fr, min_disparity, axis=2)

    def body(i, fr_roll):
        d = min_disparity + i
        sim = jnp.sum(fl * fr_roll, axis=0)
        cost = scale * (1.0 - sim) * 0.5
        cost = jnp.where(col < d, invalid, cost)
        out_ref[pl.dslice(i, 1)] = cost[None].astype(out_ref.dtype)
        return pltpu.roll(fr_roll, 1, axis=2)

    jax.lax.fori_loop(0, d_levels, body, fr)


@functools.partial(jax.jit, static_argnames=("num_disparities",
                                             "min_disparity", "scale",
                                             "interpret"))
def mccnn_volume_pallas(fl: jnp.ndarray, fr: jnp.ndarray,
                        num_disparities: int, min_disparity: int = 0,
                        scale: float = 24.0,
                        interpret: bool = False) -> jnp.ndarray:
    """Feature maps (F, H, W) -> (D, H, W) learned-cost volume.

    Pallas fast path of ``models.mccnn.mccnn_cost_volume``'s volume stage
    (numerically equal up to f32 reduction order, tested). Requires
    ``min_disparity >= 0``.
    """
    if min_disparity < 0:
        raise ValueError("mccnn_volume_pallas needs min_disparity >= 0")
    F, H, W = fl.shape
    s_blk = 8
    wp = _cdiv(W, 128) * 128
    n_sblocks = _cdiv(H, s_blk)
    pad_s = n_sblocks * s_blk - H
    if wp - W or pad_s:
        pads = ((0, 0), (0, pad_s), (0, wp - W))
        fl = jnp.pad(fl, pads)
        fr = jnp.pad(fr, pads)
    in_spec = pl.BlockSpec((F, s_blk, wp), lambda s: (0, s, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((num_disparities, s_blk, wp), lambda s: (0, s, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mccnn_vol_kernel, d_levels=num_disparities,
                          min_disparity=min_disparity, scale=float(scale)),
        grid=(n_sblocks,),
        in_specs=[in_spec, in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((num_disparities, fl.shape[1], wp),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(fl, fr)
    return out[:, :H, :W]


def _mccnn_vol_mxu_kernel(fl_ref, frp_ref, out_ref, *, d_levels, scale):
    """MXU Gram-band MC-CNN volume: out (D, s_blk, Wp), planes REVERSED.

    Per (row k, x-tile t, d-block db): one (128, F) x (F, 256) matmul
    computes the Gram block G[x_rel, c] = <fl(x), fr(j)> over the
    aligned window j in [(t-1-db)*128, (t+1-db)*128); the diagonal band
    j = x - d is extracted by a log-step shear (7 masked lane rolls:
    G2[x, c] = G[x, c + x + 1]) followed by one (128, 128) transpose.
    The shear's natural output order is d' = 127 - dd, so the kernel
    writes planes reversed and the wrapper flips the D axis once in XLA.

    The VPU variant (``_mccnn_vol_kernel``) costs ~15 ms/frame at KITTI
    shape (2*F ops per output element); this one moves the F-contraction
    to the MXU (~16 GFLOP total) — the roll/transpose overhead is the
    remaining cost. Inputs are cast to bf16 for the matmul (features are
    L2-normalized; ~1e-2 product error, inside the SGM P1/P2 scale).
    """
    k_rows = fl_ref.shape[1]
    wp = fl_ref.shape[2]
    n_tiles = wp // 128
    n_dblocks = d_levels // 128
    row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)  # d' rows
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    for k in range(k_rows):
        for t in range(n_tiles):
            A = fl_ref[:, k, t * 128:(t + 1) * 128].astype(jnp.bfloat16)
            for db in range(n_dblocks):
                # window j in [(t-1-db)*128, (t+1-db)*128); frp coords are
                # j + 128 (front pad), so the slice starts at (t-db)*128
                w0 = (t - db) * 128
                if w0 < 0:
                    # whole window left of the frame: all masked invalid
                    out_ref[pl.dslice((n_dblocks - 1 - db) * 128, 128),
                            k, t * 128:(t + 1) * 128] = \
                        jnp.full((128, 128), 1e4, out_ref.dtype)
                    continue
                B = frp_ref[:, k, w0:w0 + 256].astype(jnp.bfloat16)
                G = jax.lax.dot_general(
                    A, B, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (128, 256)
                # shear: G2[x, c] = G[x, (c + x + 1) % 256]
                G2 = pltpu.roll(G, 255, axis=1)           # c + 1
                for b in (1, 2, 4, 8, 16, 32, 64):
                    rolled = pltpu.roll(G2, 256 - b, axis=1)
                    G2 = jnp.where((row128 & b) != 0, rolled, G2)
                Mp = G2[:, 0:128]                         # (x_rel, d'=127-dd)
                Md = Mp.T                                 # (d', x_rel)
                cost = scale * (1.0 - Md) * 0.5
                # mask x < d  (d = db*128 + 127 - d')
                x_glob = x_iota + t * 128
                d_glob = db * 128 + 127 - d_iota
                cost = jnp.where(x_glob < d_glob,
                                 jnp.full((), 1e4, jnp.float32), cost)
                # plane index in REVERSED order: i' = D-1-d = D-1-db*128-127+d'
                base = (n_dblocks - 1 - db) * 128
                out_ref[pl.dslice(base, 128), k,
                        t * 128:(t + 1) * 128] = cost.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_disparities", "scale",
                                             "interpret"))
def mccnn_volume_mxu_pallas(fl: jnp.ndarray, fr: jnp.ndarray,
                            num_disparities: int, scale: float = 24.0,
                            interpret: bool = False) -> jnp.ndarray:
    """MXU fast path of :func:`mccnn_volume_pallas` (min_disparity = 0,
    D a multiple of 128). Same output up to bf16-matmul precision."""
    if num_disparities % 128:
        raise ValueError("MXU MC-CNN builder needs D % 128 == 0")
    F, H, W = fl.shape
    s_blk = 8
    wp = _cdiv(W, 128) * 128
    n_sblocks = _cdiv(H, s_blk)
    pad_s = n_sblocks * s_blk - H
    fl = jnp.pad(fl, ((0, 0), (0, pad_s), (0, wp - W)))
    # fr: pad 128 lanes on each side so every tile's 256-wide Gram
    # window (j in [(t-1)*128, (t+1)*128)) stays in-bounds
    fr = jnp.pad(fr, ((0, 0), (0, pad_s), (128, wp - W + 128)))
    in_spec = pl.BlockSpec((F, s_blk, wp), lambda s: (0, s, 0),
                           memory_space=pltpu.VMEM)
    inp_spec = pl.BlockSpec((F, s_blk, wp + 256), lambda s: (0, s, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((num_disparities, s_blk, wp), lambda s: (0, s, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mccnn_vol_mxu_kernel, d_levels=num_disparities,
                          scale=float(scale)),
        grid=(n_sblocks,),
        in_specs=[in_spec, inp_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((num_disparities, fl.shape[1], wp),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(fl, fr)
    return out[::-1, :H, :W]


# ------------------------------------------------------ MC-CNN tower ----

def _mccnn_tower_kernel(img_ref, w1_ref, w3_ref, b_ref, out_ref,
                        buf_a, buf_b, *, s_out, num_layers, features,
                        wpp, w_true, h_true):
    """Fused MC-CNN feature tower: image block -> L2-normalized features.

    Replaces ``model.apply`` (XLA spatial convs measured ~7 ms/view at
    KITTI shape — ~7% MFU regardless of dtype, round-4 profile) with an
    all-VMEM formulation: activations never touch HBM between layers.

    Layout: features live as flat ``(rows*F, wpp)`` slabs — row y's F
    channels occupy sublanes ``y*F..(y+1)*F`` with W on lanes, so

    * a 3x3 conv layer is ONE matmul per row: ``W3 @ X3`` where
      ``X3 = buf[y*F:(y+1+2)*F]`` stacks the three dy-input rows on
      sublanes (an aligned slice, F % 8 == 0 — no copies) and ``W3`` is
      the ``(3F, 3F)`` tap-stacked weight matrix (host-prepared); K=3F
      fills the MXU K dimension (192/336 vs 64/112 naive);
    * the three dx taps ride along as output-row blocks of the same
      matmul and are combined by two lane rolls of the result
      (``A @ roll(X, s) == roll(A @ X, s)`` — rolling rhs lanes rolls
      output lanes);
    * layer 1 (C_in = 1) is a 9-tap VPU broadcast FMA (matmul with K=1
      would waste the MXU).

    Convs are corner-anchored (out(y,x) uses in(y..y+2, x..x+2)); the
    frame shifts by exactly one row/col per layer so block output rows
    land at ``i*s_out`` with no final shift. To equal the Flax tower's
    ``padding="SAME"`` *bitwise* each intermediate layer re-zeroes the
    activations that fall outside the original image (flax zero-pads
    every layer's input; a deep-pad chain would instead propagate
    bias-driven values through the L-pixel border — interior pixels are
    identical either way, tested). Lane wrap-around from the rolls only
    pollutes cols >= wpp - 2L, beyond the masked data region.

    Output block (1, s_out*F, wpp+256): data written at lane offset 128
    (the front pad the Gram-band volume builder needs for its aligned
    256-wide windows) — zero margins stored explicitly since Pallas
    outputs are uninitialized.
    """
    _tower_body(img_ref, 0, w1_ref, w3_ref, b_ref, out_ref, buf_a, buf_b,
                s_out=s_out, num_layers=num_layers, features=features,
                wpp=wpp, w_true=w_true, h_true=h_true,
                row0=pl.program_id(1) * s_out)


def _tower_body(img_ref, view, w1_ref, w3_ref, b_ref, feat_ref, buf_a,
                buf_b, *, s_out, num_layers, features, wpp, w_true, h_true,
                row0):
    """The tower computation for one view's row block (shared by
    ``_mccnn_tower_kernel`` and ``_mccnn_fused_kernel``).

    ``img_ref``: (V, h_in, wpp) padded images; ``feat_ref``: where the
    final normalized features land — either the tower kernel's (1,
    s_out*F, wpp+256) output block or a fused-kernel VMEM scratch of
    shape (s_out*F, wpp+256); both get the data at lane offset 128 with
    explicit zero margins.
    """
    L = num_layers
    F = features
    r1 = s_out + 2 * L - 2       # layer-1 output rows

    emit_2d = feat_ref.ndim == 2

    col = jax.lax.broadcasted_iota(jnp.int32, (F, wpp), 1)

    def margin_mask(x, layer, y):
        # SAME semantics: zero activations outside the original image so
        # the next layer sees flax's zero padding, not deep-pad values.
        # Buffer row y of layer `layer` sits at original row
        # row0 + y + layer - L; its col x at original col x + layer - L.
        orig_row = row0 + y + layer - L
        ok_row = jnp.logical_and(orig_row >= 0, orig_row < h_true)
        lo = L - layer
        ok_col = jnp.logical_and(col >= lo, col < w_true + lo)
        return jnp.where(jnp.logical_and(ok_row, ok_col), x, 0.0)

    # python-unrolled row loops (static trip counts): Mosaic software-
    # pipelines grid steps and unrolled bodies, but a fori_loop body
    # round-trips VMEM with a serial dependence each iteration — the
    # proven-fast kernels here (_mccnn_vol_mxu_kernel, _sgm_scan_kernel)
    # all unroll statically
    for y in range(r1):
        acc = jnp.zeros((F, wpp), jnp.float32) + b_ref[0]
        for dy in range(3):
            # single-sublane dynamic loads: a multi-row load at offset
            # row0+y is not provably 8-aligned and Mosaic rejects it
            row = img_ref[view, pl.ds(row0 + y + dy, 1), :]
            for dx in range(3):
                shifted = row if dx == 0 else pltpu.roll(row, wpp - dx,
                                                         axis=1)
                acc = acc + w1_ref[dy * 3 + dx] * shifted
        acc = margin_mask(jnp.maximum(acc, 0.0), 1, y)
        buf_a[y * F:(y + 1) * F, :] = acc.astype(buf_a.dtype)

    src, dst = buf_a, buf_b
    for layer in range(1, L):
        rows = r1 - 2 * layer + 2      # input rows available in src
        r_out = rows - 2
        last = layer == L - 1
        w3l = w3_ref[layer - 1]
        for y in range(r_out):
            x3 = src[y * F:(y + 3) * F, :]
            y3 = jax.lax.dot_general(
                w3l, x3, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = (b_ref[layer] + y3[0:F]
                   + pltpu.roll(y3[F:2 * F], wpp - 1, axis=1)
                   + pltpu.roll(y3[2 * F:3 * F], wpp - 2, axis=1))
            if not last:
                dst[y * F:(y + 1) * F, :] = margin_mask(
                    jnp.maximum(acc, 0.0), layer + 1, y).astype(dst.dtype)
            else:
                ssq = jnp.sum(acc * acc, axis=0, keepdims=True)
                fn = acc * jax.lax.rsqrt(ssq + 1e-12)
                fn = jnp.where(col < w_true, fn, 0.0)
                zeros = jnp.zeros((F, 128), feat_ref.dtype)
                if emit_2d:
                    feat_ref[y * F:(y + 1) * F, pl.ds(0, 128)] = zeros
                    feat_ref[y * F:(y + 1) * F, pl.ds(128, wpp)] = \
                        fn.astype(feat_ref.dtype)
                    feat_ref[y * F:(y + 1) * F, pl.ds(128 + wpp, 128)] = \
                        zeros
                else:
                    feat_ref[0, y * F:(y + 1) * F, pl.ds(0, 128)] = zeros
                    feat_ref[0, y * F:(y + 1) * F, pl.ds(128, wpp)] = \
                        fn.astype(feat_ref.dtype)
                    feat_ref[0, y * F:(y + 1) * F,
                             pl.ds(128 + wpp, 128)] = zeros
        src, dst = dst, src


@functools.partial(jax.jit, static_argnames=("num_layers", "features",
                                             "s_out", "compute_dtype",
                                             "interpret"))
def mccnn_tower_pallas(imgs: jnp.ndarray, w1: jnp.ndarray, w3: jnp.ndarray,
                       b: jnp.ndarray, *, num_layers: int, features: int,
                       s_out: int = 16, compute_dtype=jnp.bfloat16,
                       interpret: bool = False) -> jnp.ndarray:
    """Both views' normalized images -> flat feature slabs.

    ``imgs``: (2, H, W) float32, already zero-mean/unit-std normalized.
    ``w1``: (9, F, 1) conv-0 taps; ``w3``: (L-1, 3F, 3F) stacked
    tap-block weights (``w3[l, dx*F+co, dy*F+ci] = kernel[dy,dx,ci,co]``);
    ``b``: (L, F, 1) biases. Returns (2, Hout*F, wpp+256) ``compute_dtype``
    feature slabs (Hout = ceil(H/s_out)*s_out; data lanes [128, 128+wpp))
    feeding :func:`mccnn_volume_flat_pallas` with no layout moves.
    """
    two, H, W = imgs.shape
    L, F = num_layers, features
    if two != 2:
        raise ValueError("imgs must be (2, H, W) — both views")
    if s_out % 8 or s_out <= 0:
        raise ValueError("s_out must be a positive multiple of 8 "
                         "(sublane-aligned block reads)")
    if F % 16:
        raise ValueError("features must be a multiple of 16 (bf16 "
                         "sublane tile)")
    wpp = _cdiv(W + 2 * L, 128) * 128
    nb = _cdiv(H, s_out)
    h_out = nb * s_out
    h_in = h_out + 2 * L
    imgs = jnp.pad(imgs.astype(jnp.float32),
                   ((0, 0), (L, h_in - H - L), (L, wpp - W - L)))
    wpp2 = wpp + 256
    r1 = s_out + 2 * L - 2
    dt = jnp.dtype(compute_dtype)
    out = pl.pallas_call(
        functools.partial(_mccnn_tower_kernel, s_out=s_out,
                          num_layers=L, features=F, wpp=wpp, w_true=W,
                          h_true=H),
        grid=(2, nb),
        in_specs=[
            pl.BlockSpec((1, h_in, wpp), lambda v, i: (v, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, F, 1), lambda v, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, 3 * F, 3 * F), lambda v, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, F, 1), lambda v, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_out * F, wpp2),
                               lambda v, i: (v, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h_out * F, wpp2), dt),
        scratch_shapes=[pltpu.VMEM((r1 * F, wpp), dt),
                        pltpu.VMEM(((r1 - 2) * F, wpp), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(imgs, w1.astype(dt), w3.astype(dt), b.astype(jnp.float32))
    return out


def _mccnn_vol_flat_kernel(fl_ref, fr_ref, flip_ref, out_ref, *, d_levels,
                           scale, features, wpp):
    """Flat-slab variant of ``_mccnn_vol_mxu_kernel``.

    Reads the (s_blk*F, wpp+256) feature slabs of
    :func:`mccnn_tower_pallas` directly (row k's channels at sublanes
    k*F..(k+1)*F, data lanes at offset 128 — the front pad IS the
    aligned window margin, so the wrapper pads nothing) and writes the
    (D, s_blk, W) cost block in natural D order: the shear's reversed
    plane order is undone in-register by one anti-identity matmul
    (``flip_ref``) instead of the round-3 path's full-volume XLA
    ``[::-1]`` reverse+slice (~2 x 238 MB of HBM traffic).
    """
    _gram_band_body(fl_ref, fr_ref, flip_ref[:], out_ref,
                    d_levels=d_levels, scale=scale, features=features,
                    wpp=wpp)


def _gram_band_body(fl_ref, fr_ref, flip, out_ref, *, d_levels, scale,
                    features, wpp):
    """The Gram-band volume build on one row block (shared by
    ``_mccnn_vol_flat_kernel`` and ``_mccnn_fused_kernel``).

    ``fl_ref``/``fr_ref``: (rows*F, wpp+256) flat feature slabs (data at
    lane offset 128); ``out_ref``: (D, rows, wpp) cost block.
    """
    s_blk = out_ref.shape[1]
    n_tiles = wpp // 128
    n_dblocks = d_levels // 128
    row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    for k in range(s_blk):
        for t in range(n_tiles):
            A = fl_ref[pl.ds(k * features, features),
                       128 + t * 128:128 + (t + 1) * 128]
            for db in range(n_dblocks):
                if t - db < 0:
                    out_ref[pl.dslice(db * 128, 128), k,
                            t * 128:(t + 1) * 128] = \
                        jnp.full((128, 128), 1e4, out_ref.dtype)
                    continue
                w0 = 128 + (t - 1 - db) * 128
                B = fr_ref[pl.ds(k * features, features), w0:w0 + 256]
                G = jax.lax.dot_general(
                    A, B, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (128, 256)
                # shear G2[x, c] = G[x, c + x + 1] as a 7-step masked
                # log-roll. (A single strided pltpu.roll would express
                # this, but Mosaic rejects the required stride: "max
                # shift in a vreg larger than the vreg's width", and
                # negative shifts/strides are banned — measured round 4.)
                G2 = pltpu.roll(G, 255, axis=1)           # c + 1
                for bsh in (1, 2, 4, 8, 16, 32, 64):
                    rolled = pltpu.roll(G2, 256 - bsh, axis=1)
                    G2 = jnp.where((row128 & bsh) != 0, rolled, G2)
                Mp = G2[:, 0:128]                         # (x_rel, d'=127-dd)
                # flip d' -> dd while transposing: (Mp @ P).T with P the
                # anti-identity permutation (symmetric)
                Md = jax.lax.dot_general(
                    Mp.astype(flip.dtype), flip,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).T  # (dd, x_rel)
                cost = scale * (1.0 - Md) * 0.5
                x_glob = x_iota + t * 128
                d_glob = db * 128 + d_iota
                cost = jnp.where(x_glob < d_glob,
                                 jnp.full((), 1e4, jnp.float32), cost)
                out_ref[pl.dslice(db * 128, 128), k,
                        t * 128:(t + 1) * 128] = cost.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_disparities", "h", "w",
                                             "features", "scale",
                                             "interpret"))
def mccnn_volume_flat_pallas(fl_flat: jnp.ndarray, fr_flat: jnp.ndarray,
                             num_disparities: int, h: int, w: int,
                             features: int, scale: float = 24.0,
                             interpret: bool = False) -> jnp.ndarray:
    """Flat feature slabs -> exact (D, h, w) learned-cost volume.

    MXU Gram-band builder consuming :func:`mccnn_tower_pallas` output
    as-is (zero feature-map copies); the out_shape is the exact volume
    (partial tail blocks masked by Pallas) so no slice pass follows.
    """
    if num_disparities % 128:
        raise ValueError("flat MC-CNN builder needs D % 128 == 0")
    if fl_flat.shape != fr_flat.shape:
        raise ValueError("fl/fr slabs must have identical shapes")
    if fl_flat.shape[0] % features or fl_flat.shape[0] < h * features:
        raise ValueError(f"slab rows {fl_flat.shape[0]} inconsistent with "
                         f"h={h}, features={features}")
    wpp = fl_flat.shape[1] - 256
    s_blk = 8
    n_sblocks = _cdiv(h, s_blk)
    dt = fl_flat.dtype
    flip = jnp.asarray(np.eye(128)[::-1].copy(), dt)
    in_spec = pl.BlockSpec((s_blk * features, wpp + 256),
                           lambda s: (s, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mccnn_vol_flat_kernel,
                          d_levels=num_disparities, scale=float(scale),
                          features=features, wpp=wpp),
        grid=(n_sblocks,),
        in_specs=[in_spec, in_spec,
                  pl.BlockSpec((128, 128), lambda s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((num_disparities, s_blk, wpp),
                               lambda s: (0, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_disparities, h, w),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(fl_flat, fr_flat, flip)
    return out


def _mccnn_fused_kernel(imgs_ref, w1_ref, w3_ref, b_ref, flip_ref, out_ref,
                        buf_a, buf_b, feat_l, feat_r, *, s_out, num_layers,
                        features, wpp, w_true, h_true, d_levels, scale):
    """Single-kernel MC-CNN: images -> features -> cost volume block.

    One grid step computes BOTH views' feature rows for its s_out-row
    block entirely in VMEM scratch (``_tower_body``) and immediately
    consumes them with the Gram-band builder (``_gram_band_body``) — the
    feature slabs never exist in HBM. vs the two-kernel path
    (``mccnn_tower_pallas`` + ``mccnn_volume_flat_pallas``) this removes
    the slab write + read (~2x 130 MB for the 5x112 `accurate` arch at
    KITTI shape), the traffic that kept ``mccnn_accurate_sgm8`` under
    the 30 fps bar (round-4 BENCH_DETAILS).
    """
    row0 = pl.program_id(0) * s_out
    for view, feat in ((0, feat_l), (1, feat_r)):
        _tower_body(imgs_ref, view, w1_ref, w3_ref, b_ref, feat, buf_a,
                    buf_b, s_out=s_out, num_layers=num_layers,
                    features=features, wpp=wpp, w_true=w_true,
                    h_true=h_true, row0=row0)
    _gram_band_body(feat_l, feat_r, flip_ref[:], out_ref,
                    d_levels=d_levels, scale=scale, features=features,
                    wpp=wpp)


@functools.partial(jax.jit, static_argnames=("num_disparities", "num_layers",
                                             "features", "s_out", "scale",
                                             "compute_dtype", "interpret"))
def mccnn_fused_volume_pallas(imgs: jnp.ndarray, w1: jnp.ndarray,
                              w3: jnp.ndarray, b: jnp.ndarray,
                              num_disparities: int, *, num_layers: int,
                              features: int, s_out: int = 16,
                              scale: float = 24.0,
                              compute_dtype=jnp.bfloat16,
                              interpret: bool = False) -> jnp.ndarray:
    """(2, H, W) normalized images -> exact (D, H, W) learned-cost volume
    in ONE Pallas kernel (tower + Gram-band builder, zero HBM slabs).

    Same weight-stack contract as :func:`mccnn_tower_pallas`; equal to
    the two-kernel path up to matmul ``compute_dtype`` (tested).
    Requires min_disparity == 0 and D % 128 == 0.
    """
    if num_disparities % 128:
        raise ValueError("fused MC-CNN builder needs D % 128 == 0")
    two, H, W = imgs.shape
    L, F = num_layers, features
    if two != 2:
        raise ValueError("imgs must be (2, H, W) — both views")
    if s_out % 8 or s_out <= 0:
        raise ValueError("s_out must be a positive multiple of 8")
    if F % 16:
        raise ValueError("features must be a multiple of 16")
    wpp = _cdiv(W + 2 * L, 128) * 128
    nb = _cdiv(H, s_out)
    h_out = nb * s_out
    h_in = h_out + 2 * L
    imgs = jnp.pad(imgs.astype(jnp.float32),
                   ((0, 0), (L, h_in - H - L), (L, wpp - W - L)))
    r1 = s_out + 2 * L - 2
    dt = jnp.dtype(compute_dtype)
    flip = jnp.asarray(np.eye(128)[::-1].copy(), dt)
    out = pl.pallas_call(
        functools.partial(_mccnn_fused_kernel, s_out=s_out, num_layers=L,
                          features=F, wpp=wpp, w_true=W, h_true=H,
                          d_levels=num_disparities, scale=float(scale)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((2, h_in, wpp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, F, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, 3 * F, 3 * F), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, F, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_disparities, s_out, wpp),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_disparities, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r1 * F, wpp), dt),
                        pltpu.VMEM(((r1 - 2) * F, wpp), dt),
                        pltpu.VMEM((s_out * F, wpp + 256), dt),
                        pltpu.VMEM((s_out * F, wpp + 256), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(imgs, w1.astype(dt), w3.astype(dt), b.astype(jnp.float32), flip)
    return out


# ------------------------------------- fused census + horizontal scan ----

def _sgm_scan_census_kernel(cl_ref, cr_ref, *rest, p1, p2, s_blk, reverse,
                            has_acc, d_levels, min_disparity, n_sblocks,
                            w_true, words, rev_c0, invalid_cost):
    """Horizontal SGM scan whose cost rows are built in-register from
    census words — the volT volume never exists in HBM.

    Round-3's stage 0 wrote the transposed cost volume
    (``census_volume_T_pallas``, 238 MB at KITTI shape) only for the two
    horizontal scans to stream it back in (2 x 238 MB). Here each scan
    step maintains a circular window of the D most recent right-census
    rows in VMEM scratch (``ring``): slot ``(-x) mod D`` holds row x, so
    one single-row store per step replaces exactly the row that falls
    out of the window, and the d-ordered cost source is ONE dynamic
    sublane rotate: ``rotate(ring, x mod D)[d] = cr[x - d]``. The cost
    row is then ``popcount(cl[x] ^ rotated)`` summed over words —
    VMEM-bandwidth work in place of ~714 MB of HBM traffic per frame.

    Reverse scans window *ahead* of the cursor; the first step seeds the
    ring from the aligned tail slab, un-reversed by an anti-identity
    matmul in f32 (exact for census words <= 24 bits — the wrapper
    gates on that) and rotated into slot order by the static ``rev_c0``.
    """
    it = iter(rest)
    anti_ref = next(it) if reverse else None
    acc_ref = next(it) if has_acc else None
    out_ref = next(it)
    carry_ref = next(it)
    ring_ref = next(it)
    D = d_levels
    tile_n = out_ref.shape[2]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)
        if reverse:
            anti = anti_ref[:]
            wp = cr_ref.shape[1]
            for w in range(words):
                slab = cr_ref[w, wp - D:wp, :].astype(jnp.float32)
                rev = jax.lax.dot_general(
                    anti, slab, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ring_ref[w] = pltpu.roll(rev.astype(jnp.int32), rev_c0,
                                         axis=0)

    base = ((n_sblocks - 1 - s) if reverse else s) * s_blk
    carry = carry_ref[:]
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, tile_n), 0)
    for k in (range(s_blk - 1, -1, -1) if reverse else range(s_blk)):
        x = base + k
        ins_row = x if not reverse else jnp.maximum(x - D + 1, 0)
        cost = jnp.zeros((D, tile_n), jnp.float32)
        for w in range(words):
            slot = (-ins_row) % D
            ring_ref[w, pl.ds(slot, 1), :] = cr_ref[w, pl.ds(ins_row, 1), :]
            rotated = pltpu.roll(ring_ref[w], x % D, axis=0)
            clx = cl_ref[w, pl.ds(k, 1), :]
            cost = cost + jax.lax.population_count(
                jnp.bitwise_xor(rotated, clx)).astype(jnp.float32)
        cost = jnp.where(d_iota > x - min_disparity,
                         jnp.float32(invalid_cost), cost)
        cost = jnp.where(x >= w_true, jnp.float32(0.0), cost)
        carry = _sgm_step(cost, carry, p1, p2)
        if has_acc:
            out_ref[:, k, :] = acc_ref[:, k, :] + carry
        else:
            out_ref[:, k, :] = carry
    carry_ref[:] = carry


def _census_scan_padded(clT, crT, accum, D, min_disparity, p1, p2,
                        reverse, w_true, tile_n, invalid_cost, interpret):
    """Padded-shape core of the census-fused scan (one direction).

    Operands arrive pre-padded ((words, wp, hp) / (D, wp, hp)); callers
    chain passes without re-pad/slice volume copies in between.
    """
    words, wp, hp = clT.shape
    s_blk = 8
    n_sblocks = wp // s_blk
    n_tiles = hp // tile_n
    rev_c0 = (1 - wp) % D

    def idx(n, s):
        return (0, (n_sblocks - 1 - s) if reverse else s, n)

    cl_spec = pl.BlockSpec((words, s_blk, tile_n), idx,
                           memory_space=pltpu.VMEM)
    cr_spec = pl.BlockSpec((words, wp, tile_n), lambda n, s: (0, 0, n),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((D, s_blk, tile_n), idx,
                            memory_space=pltpu.VMEM)
    operands = [clT, crT]
    in_specs = [cl_spec, cr_spec]
    if reverse:
        operands.append(jnp.asarray(np.eye(D)[::-1].copy(), jnp.float32))
        in_specs.append(pl.BlockSpec((D, D), lambda n, s: (0, 0),
                                     memory_space=pltpu.VMEM))
    aliases = {}
    if accum is not None:
        operands.append(accum)
        in_specs.append(out_spec)
        aliases = {len(operands) - 1: 0}
    return pl.pallas_call(
        functools.partial(
            _sgm_scan_census_kernel, p1=float(p1), p2=float(p2),
            s_blk=s_blk, reverse=reverse, has_acc=accum is not None,
            d_levels=D, min_disparity=min_disparity,
            n_sblocks=n_sblocks, w_true=w_true, words=words,
            rev_c0=rev_c0, invalid_cost=float(invalid_cost)),
        grid=(n_tiles, n_sblocks),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((D, wp, hp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, tile_n), jnp.float32),
                        pltpu.VMEM((words, D, tile_n), jnp.int32)],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*operands)


def _census_scan_pads(clT, crT, D, min_disparity, tile_n):
    words, W, H = clT.shape
    if W < D:
        raise ValueError("fused census scan needs W >= num_disparities")
    wp = _cdiv(W, 8) * 8
    tile_n = _fit_tile_n(tile_n, H, D, 8, 4, n_bufs=2, n_scratch=2)
    hp = _cdiv(H, tile_n) * tile_n
    clT = jnp.pad(clT, ((0, 0), (0, wp - W), (0, hp - H)))
    crT = jnp.pad(crT, ((0, 0), (0, wp - W), (0, hp - H)))
    if min_disparity:
        # shift right-rows so ring row x holds cr[x - min_d]
        crT = jnp.roll(crT, min_disparity, axis=1)
    return clT, crT, tile_n, W, H, wp, hp


@functools.partial(jax.jit, static_argnames=("num_disparities",
                                             "min_disparity", "p1", "p2",
                                             "reverse", "invalid_cost",
                                             "tile_n", "interpret"))
def sgm_census_scan_pallas(clT: jnp.ndarray, crT: jnp.ndarray,
                           accum: jnp.ndarray | None,
                           num_disparities: int, min_disparity: int,
                           p1: float, p2: float, reverse: bool = False,
                           invalid_cost: float = 1e4, tile_n: int = 640,
                           interpret: bool = False) -> jnp.ndarray:
    """One horizontal census-fused scan pass -> (D, W, H) totals.

    ``accum`` adds in place (aliased) like ``sgm_scan_pallas``.
    ``invalid_cost`` selects the x<d sentinel (1e4 default; 1024 for the
    streaming pipeline's bounded-int16 wire mode). Used by the streaming
    stage pipeline, which runs the two directions on different chips;
    single-chip callers use :func:`sgm_census_hpair_pallas` (no pad/slice
    copies between the passes).
    """
    D = num_disparities
    clT, crT, tile_n, W, H, wp, hp = _census_scan_pads(
        clT, crT, D, min_disparity, tile_n)
    if accum is not None:
        accum = jnp.pad(accum, ((0, 0), (0, wp - accum.shape[1]),
                                (0, hp - accum.shape[2])))
    out = _census_scan_padded(clT, crT, accum, D, min_disparity, p1, p2,
                              reverse, W, tile_n, invalid_cost, interpret)
    return out[:, :W, :H]


@functools.partial(jax.jit, static_argnames=("num_disparities",
                                             "min_disparity", "p1", "p2",
                                             "tile_n", "interpret"))
def sgm_census_hpair_pallas(clT: jnp.ndarray, crT: jnp.ndarray,
                            num_disparities: int, min_disparity: int,
                            p1: float, p2: float, tile_n: int = 640,
                            interpret: bool = False) -> jnp.ndarray:
    """Census words (words, W, H) -> horizontal fwd+rev SGM total (D, W, H).

    Replaces ``census_volume_T_pallas`` + two ``sgm_scan_pallas`` passes:
    same bit-exact totals (tested) with no transposed volume in HBM.
    Requires census words <= 24 bits (exact f32 reversal matmul; the
    default (5, 5) window packs 24) and W >= D for the reverse seed.
    """
    D = num_disparities
    clT, crT, tile_n, W, H, wp, hp = _census_scan_pads(
        clT, crT, D, min_disparity, tile_n)
    tot = _census_scan_padded(clT, crT, None, D, min_disparity, p1, p2,
                              False, W, tile_n, 1e4, interpret)
    tot = _census_scan_padded(clT, crT, tot, D, min_disparity, p1, p2,
                              True, W, tile_n, 1e4, interpret)
    return tot[:, :W, :H]
