"""Pallas TPU kernels for the speckle filter (labels + size threshold).

``ops/speckle.py`` computes connected-component min-labels with
``lax.associative_scan`` sweeps; on TPU each of those scans costs ~3.8 ms
(XLA lowers the odd/even tuple recursion with unfused layout copies), so
the 3-4 sweep fixpoint dominated the speckle config at ~37 ms/frame
(round-3 probe), and the ``segment_sum``+gather size computation adds
~10 ms more (lax.sort: ~4 ms per sort; even a 1-D cumsum is 3.5 ms at
this size — every XLA option is dispatch/layout-bound). These kernels
keep the maps VMEM-resident and do everything with ``pltpu.roll`` +
selects: no scatter, no gather, no sort, one short kernel chain per
frame.

Semantics are identical to the XLA path (equal filtered outputs, tested):
the per-direction segmented-min monoid is associative, so prefix doubling
computes the same inclusive scans; labels differ only by the padded-width
linear index base.

Memory notes (hard-won): Mosaic cannot rotate non-32-bit vectors, so all
masks travel as int32, and the 16 MB scoped-VMEM stack bounds how many
(Hp, Wp) i32 maps may be live at once — hence the 4 connectivity masks
ride in ONE packed bitfield input and the size-threshold pass is split
into three kernels (distance/parent, count delivery, keep broadcast)
instead of one.

Size thresholding scheme (exact ``filterSpeckles`` decision, no
scatter/gather/sort):

1. BFS distance-to-root per pixel by neighbor relaxation (root = the
   pixel whose linear index equals the converged min-label).
2. Deterministic spanning tree: parent = first connected neighbor (N, W,
   E, S priority) one BFS level closer to the root. Trees span blobs
   with cycles, which pure leaf-peeling (k-core) cannot handle.
3. Bottom-up count delivery: for k = K..1, every pixel at distance k
   adds its subtree count to its parent; children (distance k+1) were
   delivered in earlier rounds, so each pixel is counted exactly once.
4. keep-signal broadcast over components: keep iff the root collected
   >= T, or any member lies beyond the delivery horizon K (conservative
   for pathologically deep components, mirroring the label-fixpoint cap
   policy).

The horizon K = min(T - 1, round cap): a component with size < T has BFS
depth <= size - 1 <= T - 2, so small components are always counted
exactly and the decision is exact whenever T - 1 <= the round cap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 2 ** 30          # invalid-label sentinel (python int, closed over)

# packed-connectivity bit layout
_W_BIT, _N_BIT = 0, 1


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _roll_from(x, d):
    """Value of the direction-``d`` neighbor (N/W/E/S) at each pixel."""
    if d == "n":
        return pltpu.roll(x, 1, axis=0)
    if d == "s":
        return pltpu.roll(x, x.shape[0] - 1, axis=0)
    if d == "w":
        return pltpu.roll(x, 1, axis=1)
    return pltpu.roll(x, x.shape[1] - 1, axis=1)


def _conns(packed):
    """Packed bitfield -> {n, w, e, s} int32 0/1 connectivity maps.

    conn[d][y, x] == 1 iff the pixel is 4-connected to its ``d`` neighbor
    (within max_diff and both valid). E/S are W/N seen from the other
    side, i.e. rolls of the packed field.
    """
    pe = _roll_from(packed, "e")
    ps = _roll_from(packed, "s")
    return {
        "w": (packed >> _W_BIT) & 1,
        "n": (packed >> _N_BIT) & 1,
        "e": (pe >> _W_BIT) & 1,
        "s": (ps >> _N_BIT) & 1,
    }


_FLAG = 1 << 30         # break-flag bit of the packed (value | flag) word


def _seg_min_scan_db(v, b, axis, reverse, big):
    """Inclusive segmented min scan by doubling on a VMEM-resident map.

    ``v`` int32 values (< 2**30), ``b`` int32 0/1 break flags (1 = not
    connected to the scan-order predecessor; int32 because Mosaic cannot
    rotate 1-bit vectors). Matches ``ops.speckle.speckle_filter``'s
    associative_scan combine: out = b ? v : min(prev_aggregate, v).

    The evolving (value, flag) pair is carried as ONE packed int32
    (flag in bit 30) so the doubling loop keeps 2 live maps instead of 4
    — the 16 MB scoped-VMEM stack is the binding constraint here.
    """
    n = v.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    c = v | (b * _FLAG)
    s = 1
    while s < n:
        sh = s if not reverse else n - s
        c_sh = pltpu.roll(c, sh, axis=axis)
        edge = (idx < s) if not reverse else (idx >= n - s)
        c_sh = jnp.where(edge, big | _FLAG, c_sh)
        mn = jnp.minimum(c & (_FLAG - 1), c_sh & (_FLAG - 1))
        v_new = jnp.where(c >= _FLAG, c & (_FLAG - 1), mn)
        c = v_new | ((c | c_sh) & _FLAG)
        s *= 2
    return c & (_FLAG - 1)


def _sweep_fixpoint(v, packed, max_iters):
    """Run (x-fwd, x-rev, y-fwd, y-rev) segmented-min sweeps on ``v`` to
    the fixpoint (or ``max_iters``); returns (v, unconverged).

    Break masks are derived from ``packed`` inside the loop body (scan by
    scan) so at most one is live at a time."""
    big = jnp.int32(_INF)

    def sweep(x):
        c = _conns(packed)
        x = _seg_min_scan_db(x, 1 - c["w"], 1, False, big)
        x = _seg_min_scan_db(x, 1 - c["e"], 1, True, big)
        x = _seg_min_scan_db(x, 1 - c["n"], 0, False, big)
        x = _seg_min_scan_db(x, 1 - c["s"], 0, True, big)
        return x

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        x, _, it = state
        new = sweep(x)
        return new, jnp.any(new != x), it + 1

    v, unconverged, _ = jax.lax.while_loop(
        cond, body, (v, jnp.bool_(True), jnp.int32(0)))
    return v, unconverged


def _labels_kernel(init_ref, packed_ref, out_ref, flag_ref, *, max_iters):
    labels, unconverged = _sweep_fixpoint(init_ref[:], packed_ref[:],
                                          max_iters)
    out_ref[:] = labels
    flag_ref[0, 0] = unconverged.astype(jnp.int32)


def _dist_kernel(labels_ref, packed_ref, dist_ref, parent_ref, *, round_cap):
    """BFS distance + spanning-tree parent direction (0 none, 1 N, 2 W,
    3 E, 4 S)."""
    labels = labels_ref[:]
    packed = packed_ref[:]
    Hp, Wp = labels.shape
    row = jax.lax.broadcasted_iota(jnp.int32, labels.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, labels.shape, 1)
    valid = labels < _INF
    is_root = valid & (labels == row * jnp.int32(Wp) + col)

    def relax_cond(state):
        _, changed, it = state
        return changed & (it < round_cap + 1)

    def relax_body(state):
        dist, _, it = state
        best = dist
        for d, cn in _conns(packed).items():
            nb = jnp.where(cn != 0, _roll_from(dist, d), jnp.int32(_INF))
            best = jnp.minimum(best, jnp.where(nb < _INF, nb + 1,
                                               jnp.int32(_INF)))
        new = jnp.where(is_root, 0, best)
        return new, jnp.any(new != dist), it + 1

    dist0 = jnp.where(is_root, 0, jnp.int32(_INF))
    dist, _, _ = jax.lax.while_loop(relax_cond, relax_body,
                                    (dist0, jnp.bool_(True), jnp.int32(0)))
    dist_ref[:] = dist

    parent = jnp.zeros_like(labels)
    cs = _conns(packed)
    for code, d in ((4, "s"), (3, "e"), (2, "w"), (1, "n")):
        nb = jnp.where(cs[d] != 0, _roll_from(dist, d), jnp.int32(_INF))
        ok = valid & ~is_root & (dist < _INF) & (nb == dist - 1)
        parent = jnp.where(ok, code, parent)
    parent_ref[:] = parent


def _deliver_kernel(packed_ref, dist_ref, parent_ref, cnt_ref,
                    *, threshold, round_cap):
    """Bottom-up subtree count delivery along parent pointers."""
    packed = packed_ref[:]
    dist = dist_ref[:]
    parent = parent_ref[:]
    k_start = jnp.minimum(
        jnp.max(jnp.where(dist < _INF, dist, 0)),
        jnp.int32(min(threshold - 1, round_cap)))
    opposite = {"n": 4, "w": 3, "e": 2, "s": 1}   # nb's parent -> me

    def cond(state):
        _, k = state
        return k >= 1

    def body(state):
        cnt, k = state
        total = cnt
        for d, cn in _conns(packed).items():
            p_nb = _roll_from(parent, d)
            d_nb = _roll_from(dist, d)
            c_nb = _roll_from(cnt, d)
            take = (cn != 0) & (p_nb == opposite[d]) & (d_nb == k)
            total = total + jnp.where(take, c_nb, 0)
        return total, k - 1

    cnt0 = jnp.where(dist < _INF, 1, 0).astype(jnp.int32)
    cnt, _ = jax.lax.while_loop(cond, body, (cnt0, k_start))
    cnt_ref[:] = cnt


def _keep_kernel(labels_ref, packed_ref, dist_ref, cnt_ref, out_ref,
                 *, threshold, round_cap, sweep_cap):
    """Broadcast the per-component keep signal (root count >= T, or any
    member beyond the delivery horizon) to every member."""
    labels = labels_ref[:]
    packed = packed_ref[:]
    dist = dist_ref[:]
    cnt = cnt_ref[:]
    Hp, Wp = labels.shape
    row = jax.lax.broadcasted_iota(jnp.int32, labels.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, labels.shape, 1)
    valid = labels < _INF
    is_root = valid & (labels == row * jnp.int32(Wp) + col)
    k_start = jnp.minimum(
        jnp.max(jnp.where(dist < _INF, dist, 0)),
        jnp.int32(min(threshold - 1, round_cap)))
    sig = (is_root & (cnt >= threshold)) | \
        (valid & ~is_root & (dist > k_start))
    v = jnp.where(sig, 0, 1).astype(jnp.int32)
    v, _ = _sweep_fixpoint(v, packed, sweep_cap)
    out_ref[:] = (valid & (v == 0)).astype(jnp.int32)


def _call(kernel, outs, *args, interpret):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_specs = tuple(
        pl.BlockSpec(memory_space=pltpu.SMEM) if o == (1, 1) else spec
        for o in outs)
    out_shape = tuple(jax.ShapeDtypeStruct(o, jnp.int32) for o in outs)
    if len(outs) == 1:
        out_specs, out_shape = out_specs[0], out_shape[0]
    return pl.pallas_call(
        kernel,
        in_specs=[spec] * len(args),
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("max_speckle_size", "max_iters",
                                             "round_cap", "interpret"))
def speckle_filter_pallas(disparity: jnp.ndarray, max_speckle_size: int,
                          max_diff: float, max_iters: int = 64,
                          round_cap: int | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Pallas fast path of ``ops.speckle.speckle_filter`` (same output on
    any input where both reach their fixpoints — tested; both fall back
    to keep-all when their caps are hit; components deeper than
    ``round_cap`` BFS levels are conservatively kept)."""
    if max_speckle_size <= 0:
        return disparity
    d = jnp.asarray(disparity, jnp.float32)
    H, W = d.shape
    Hp = _cdiv(H, 8) * 8
    Wp = _cdiv(W, 128) * 128
    if round_cap is None:
        round_cap = min(max_speckle_size - 1, 2 * (Hp + Wp))
    valid = jnp.isfinite(d)
    dval = jnp.where(valid, d, jnp.float32(jnp.inf))

    def shift(x, dy, dx, fill):
        out = jnp.roll(x, (dy, dx), axis=(0, 1))
        if dy == 1:
            out = out.at[0, :].set(fill)
        if dx == 1:
            out = out.at[:, 0].set(fill)
        return out

    inf = jnp.float32(jnp.inf)
    conn_w = valid & (jnp.abs(shift(dval, 0, 1, inf) - dval) <= max_diff)
    conn_n = valid & (jnp.abs(shift(dval, 1, 0, inf) - dval) <= max_diff)
    packed = (conn_w.astype(jnp.int32) << _W_BIT) | \
        (conn_n.astype(jnp.int32) << _N_BIT)
    # init labels in PADDED linear-index space (the root test in the
    # kernels compares against row * Wp + col)
    lin = (jnp.arange(H)[:, None] * Wp
           + jnp.arange(W)[None, :]).astype(jnp.int32)
    init = jnp.where(valid, lin, jnp.int32(_INF))
    pads = ((0, Hp - H), (0, Wp - W))
    init = jnp.pad(init, pads, constant_values=jnp.int32(_INF))
    packed = jnp.pad(packed, pads)          # padded cells: unconnected

    shape = (Hp, Wp)
    labels, flag = _call(
        functools.partial(_labels_kernel, max_iters=max_iters),
        (shape, (1, 1)), init, packed, interpret=interpret)
    dist, parent = _call(
        functools.partial(_dist_kernel, round_cap=round_cap),
        (shape, shape), labels, packed, interpret=interpret)
    cnt = _call(
        functools.partial(_deliver_kernel, threshold=max_speckle_size,
                          round_cap=round_cap),
        (shape,), packed, dist, parent, interpret=interpret)
    keep = _call(
        functools.partial(_keep_kernel, threshold=max_speckle_size,
                          round_cap=round_cap, sweep_cap=max_iters),
        (shape,), labels, packed, dist, cnt, interpret=interpret)
    keep = (keep[:H, :W] != 0) | (flag[0, 0] != 0)
    return jnp.where(keep & valid, d, jnp.nan)
