"""Pipeline-stage parallelism: streaming video across chips.

The "PP analog" of SURVEY.md §2's parallelism inventory: the reference
processes one frame at a time through rectify -> cost -> SGM -> post
(``disparity_calculation.py`` flow); for streaming video on a TPU slice the
same stages become a chip-resident pipeline — chip ``i`` holds stage ``i``,
frames enter at chip 0, and the inter-stage activation (the cost volume +
running path-total pair) rotates one hop per step over ICI via
``lax.ppermute``. With S chips, S frames are in flight and steady-state
throughput is one frame per *stage* time instead of one per *pipeline*
time.

Stage decomposition (exactly the single-chip fast path's pass structure,
``ops/pallas_kernels.sgm_aggregate_wta_pallas``, so outputs are
bit-identical to ``pipeline.stereo._match_core``):

====  =====================================================================
  0   census words -> (D, W, H) volume (transposed builder) + horizontal
      forward scan
  1   horizontal reverse scan; transpose to planes layout (D, H, W)
  2   fused vertical+diagonal forward pass (scan3)
  3   fused reverse pass with WTA statistics; uniqueness/LR/subpixel;
      speckle + WLS
====  =====================================================================

``n_stages=2`` fuses {0,1} and {2,3} for a 2-chip pipeline. The in-flight
payload is a flat (2, D*H*W) float32 slab so every stage's activation has
one uniform shape (stage 0/1 view it as (D, W, H), stages 2/3 as
(D, H, W)) — ``lax.switch`` branches and the ppermute rotation then need
no per-stage plumbing.

All of this runs inside ``shard_map`` over a mesh "stage" axis; on CPU
meshes (tests, dryrun) the Pallas kernels run in interpret mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stereo_match_tpu.config import DisparityConfig


def _census_T(img: jnp.ndarray, window) -> jnp.ndarray:
    from stereo_match_tpu.ops.census import census_transform
    return jnp.swapaxes(jnp.moveaxis(census_transform(img, window), -1, 0),
                        1, 2)


def make_stage_fns(cfg: DisparityConfig, image_shape: tuple[int, int],
                   n_stages: int, interpret: bool,
                   invalid_clamp: float | None = None):
    """The ``lax.switch`` branches: (payload, left, right) -> (payload, out).

    ``payload``: (2, D*H*W) float32; ``out``: (2, H, W) [raw, filtered]
    disparity, zeros except from the final stage.

    ``invalid_clamp``: when set, the builder stage clamps the volume to
    this value, replacing the f32 INVALID_COST (1e4) sentinel at x < d
    cells with the bounded-int sentinel (1024, ``INVALID_COST_I16``
    semantics of ``ops/cost_volume.py:33``) so path totals stay inside
    int16 on the wire. Census costs are <= the window bit count < 1024,
    so the clamp only rewrites invalid cells.
    """
    if cfg.cost != "census" or cfg.num_paths != 8 or cfg.min_disparity < 0:
        raise ValueError("stage pipeline supports the production fast path: "
                         "census cost, 8-path SGM, min_disparity >= 0")
    if n_stages not in (2, 4):
        raise ValueError("n_stages must be 2 or 4")
    from stereo_match_tpu.ops.pallas_kernels import (
        census_volume_T_pallas, sgm_scan3_pallas, sgm_scan3_stats_pallas,
        sgm_scan_pallas)
    from stereo_match_tpu.ops.speckle import speckle_filter
    from stereo_match_tpu.ops.wls import wls_filter_disparity
    from stereo_match_tpu.ops.wta import extract_disparity_fast

    H, W = image_shape
    D = cfg.num_disparities
    p1, p2 = cfg.P1, cfg.P2
    kw = dict(p1=p1, p2=p2, interpret=interpret)

    def pack(a, b):
        return jnp.stack([a.reshape(-1), b.reshape(-1)])

    def unpack(p, shape):
        return p[0].reshape(shape), p[1].reshape(shape)

    zero_out = jnp.zeros((2, H, W), jnp.float32)

    def build_hfwd(p, left, right):
        clT = _census_T(left, cfg.census_window)
        crT = _census_T(right, cfg.census_window)
        volT = census_volume_T_pallas(clT, crT, D, cfg.min_disparity,
                                      dtype=jnp.float32, interpret=interpret)
        if invalid_clamp is not None:
            volT = jnp.minimum(volT, jnp.float32(invalid_clamp))
        totT = sgm_scan_pallas(volT, None, reverse=False, **kw)
        return pack(volT, totT), zero_out

    def hrev_transpose(p, left, right):
        volT, totT = unpack(p, (D, W, H))
        totT = sgm_scan_pallas(volT, totT, reverse=True, **kw)
        return pack(jnp.swapaxes(volT, 1, 2), jnp.swapaxes(totT, 1, 2)), \
            zero_out

    def scan3_fwd(p, left, right):
        vol, tot = unpack(p, (D, H, W))
        tot = sgm_scan3_pallas(vol, tot, reverse=False, **kw)
        return pack(vol, tot), zero_out

    def scan3_rev_post(p, left, right):
        vol, tot = unpack(p, (D, H, W))
        outs = sgm_scan3_stats_pallas(vol, tot, p1, p2, reverse=True,
                                      interpret=interpret)
        agg, stats = outs[0], outs[1:]
        disp = extract_disparity_fast(
            agg, stats=stats, min_disparity=cfg.min_disparity,
            uniqueness_ratio=cfg.uniqueness_ratio,
            disp12_max_diff=cfg.disp12_max_diff, subpixel=cfg.subpixel,
            interpret=interpret)
        disp = speckle_filter(disp, cfg.speckle_window_size,
                              cfg.speckle_range)
        if cfg.wls:
            filt = wls_filter_disparity(disp, left, lmbda=cfg.lmbda,
                                        sigma_color=cfg.sigma,
                                        num_iter=cfg.wls_iters)
        else:
            filt = disp
        return pack(vol, agg), jnp.stack([disp, filt])

    units = [build_hfwd, hrev_transpose, scan3_fwd, scan3_rev_post]
    if n_stages == 4:
        return units

    def compose(f, g):
        def h(p, left, right):
            p, _ = f(p, left, right)
            return g(p, left, right)
        return h

    return [compose(units[0], units[1]), compose(units[2], units[3])]


def _n_census_words(window) -> int:
    return -(-(window[0] * window[1] - 1) // 32)


def make_stage_fns_census(cfg: DisparityConfig, image_shape: tuple[int, int],
                          n_stages: int, interpret: bool,
                          invalid_clamp: float | None = None):
    """Census-payload stage branches: the wire carries (running total,
    census words) instead of (cost volume, running total).

    The cost volume is a pure function of the census words, so instead of
    rotating it over ICI every hop (238 MB at KITTI shape) each stage
    REBUILDS what it needs locally: stages 0/1 run the census-fused
    horizontal scans (``sgm_census_scan_pallas`` — no volume at all),
    stages 2/3 rebuild the planes-layout volume in HBM once each
    (``census_volume_pallas``, ~1 local volume write, no ICI). Per-hop
    payload drops from 2 to ~1.03 volume-equivalents — the f32 pipeline
    goes from ICI-bound (~10 ms/hop vs 7-8 ms stage compute,
    docs/architecture.md) to compute-bound.

    Branch signature: ``(tot, words, left, right) -> (tot, words, out)``
    with ``tot``: (D*H*W,) f32, ``words``: (2*n_words*H*W,) int32 holding
    [clT | crT] in the transposed (words, W, H) layout stages 0/1 scan.
    """
    if cfg.cost != "census" or cfg.num_paths != 8 or cfg.min_disparity < 0:
        raise ValueError("stage pipeline supports the production fast path: "
                         "census cost, 8-path SGM, min_disparity >= 0")
    if n_stages not in (2, 4):
        raise ValueError("n_stages must be 2 or 4")
    wh, ww = cfg.census_window
    if wh * ww - 1 > 24:
        raise ValueError("census payload mode needs <= 24-bit census "
                         "words (window area - 1 <= 24)")
    from stereo_match_tpu.ops.census import census_transform
    from stereo_match_tpu.ops.pallas_kernels import (
        census_volume_pallas, sgm_census_scan_pallas, sgm_scan3_pallas,
        sgm_scan3_stats_pallas)
    from stereo_match_tpu.ops.speckle import speckle_filter
    from stereo_match_tpu.ops.wls import wls_filter_disparity
    from stereo_match_tpu.ops.wta import extract_disparity_fast

    H, W = image_shape
    D = cfg.num_disparities
    nw = _n_census_words(cfg.census_window)
    p1, p2 = cfg.P1, cfg.P2
    invalid = 1e4 if invalid_clamp is None else float(invalid_clamp)
    scan_kw = dict(num_disparities=D, min_disparity=cfg.min_disparity,
                   p1=p1, p2=p2, invalid_cost=invalid, interpret=interpret)
    kw3 = dict(p1=p1, p2=p2, interpret=interpret)
    zero_out = jnp.zeros((2, H, W), jnp.float32)

    def unpack_words(wv):
        both = wv.reshape(2, nw, W, H)
        return both[0], both[1]

    def rebuild_vol(wv):
        clT, crT = unpack_words(wv)
        vol = census_volume_pallas(jnp.swapaxes(clT, 1, 2),
                                   jnp.swapaxes(crT, 1, 2), D,
                                   cfg.min_disparity, dtype=jnp.float32,
                                   interpret=interpret)
        if invalid_clamp is not None:
            vol = jnp.minimum(vol, jnp.float32(invalid_clamp))
        return vol

    def s0(tot, wv, left, right):
        clT = _census_T(left, cfg.census_window)
        crT = _census_T(right, cfg.census_window)
        totT = sgm_census_scan_pallas(clT, crT, None, reverse=False,
                                      **scan_kw)
        wv = jnp.stack([clT, crT]).reshape(-1)
        return totT.reshape(-1), wv, zero_out

    def s1(tot, wv, left, right):
        clT, crT = unpack_words(wv)
        totT = sgm_census_scan_pallas(clT, crT, tot.reshape(D, W, H),
                                      reverse=True, **scan_kw)
        return jnp.swapaxes(totT, 1, 2).reshape(-1), wv, zero_out

    def s2(tot, wv, left, right):
        vol = rebuild_vol(wv)
        t = sgm_scan3_pallas(vol, tot.reshape(D, H, W), reverse=False,
                             **kw3)
        return t.reshape(-1), wv, zero_out

    def s3(tot, wv, left, right):
        vol = rebuild_vol(wv)
        outs = sgm_scan3_stats_pallas(vol, tot.reshape(D, H, W), p1, p2,
                                      reverse=True, interpret=interpret)
        agg, stats = outs[0], outs[1:]
        disp = extract_disparity_fast(
            agg, stats=stats, min_disparity=cfg.min_disparity,
            uniqueness_ratio=cfg.uniqueness_ratio,
            disp12_max_diff=cfg.disp12_max_diff, subpixel=cfg.subpixel,
            interpret=interpret)
        disp = speckle_filter(disp, cfg.speckle_window_size,
                              cfg.speckle_range)
        if cfg.wls:
            filt = wls_filter_disparity(disp, left, lmbda=cfg.lmbda,
                                        sigma_color=cfg.sigma,
                                        num_iter=cfg.wls_iters)
        else:
            filt = disp
        return agg.reshape(-1), wv, jnp.stack([disp, filt])

    units = [s0, s1, s2, s3]
    if n_stages == 4:
        return units

    def compose(f, g):
        def h(tot, wv, left, right):
            tot, wv, _ = f(tot, wv, left, right)
            return g(tot, wv, left, right)
        return h

    return [compose(units[0], units[1]), compose(units[2], units[3])]


class StreamingPipeline:
    """Chip-resident stage pipeline over a mesh "stage" axis.

    >>> mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("stage",))
    >>> pipe = StreamingPipeline(cfg, mesh, image_shape=(H, W))
    >>> results = pipe.run(frames)          # [(raw, filtered), ...]

    Frame t's disparity emerges ``n_stages - 1`` steps after it is fed;
    :meth:`run` handles the fill/flush bookkeeping. State (the S in-flight
    activations) lives sharded on the devices between steps.

    ``payload_dtype="int16"`` halves the per-hop ICI payload (477 -> 238
    MB at KITTI shape) for census costs with integral P1/P2. It switches
    the invalid-cell sentinel from 1e4 to 1024 (``INVALID_COST_I16``
    semantics) so all wire values are bounded integers; outputs are
    bit-identical to a float32 run with the same clamped sentinel, and
    may differ from the default f32 pipeline only in left-edge columns
    where x < d for most disparities — see docs/architecture.md "ICI
    budget of the streaming stage pipeline".

    ``payload_mode="census"`` halves it again structurally: the wire
    carries (running total, census words) and every stage rebuilds the
    volume it needs locally (see :func:`make_stage_fns_census`) — 477 ->
    242 MB/hop f32, 123 MB with the int16 wire. Bit-identical to the
    single-chip fast path (tested).
    """

    def __init__(self, config: DisparityConfig, mesh: Mesh,
                 image_shape: tuple[int, int], axis: str = "stage",
                 interpret: bool | None = None,
                 payload_dtype: str = "float32",
                 payload_mode: str = "volume",
                 _invalid_clamp: float | None = None):
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        if payload_dtype not in ("float32", "int16"):
            raise ValueError("payload_dtype must be float32 or int16")
        if payload_mode not in ("volume", "census"):
            raise ValueError("payload_mode must be volume or census")
        self.config = config
        self.mesh = mesh
        self.axis = axis
        self.n_stages = mesh.shape[axis]
        # _invalid_clamp: test hook — run the f32 pipeline with the int16
        # mode's clamped sentinel so wire losslessness is testable bitwise.
        invalid_clamp = _invalid_clamp
        if payload_dtype == "int16":
            # int16 hops are bit-exact only for bounded-integer costs and
            # totals. The builder clamps the invalid sentinel from 1e4 to
            # 1024 (INVALID_COST_I16 semantics) — with the f32 sentinel the
            # running total after scan3_fwd (5 paths in flight at the
            # stage-2->3 hop of the 4-stage split) is >= 5*(1e4+P2) > 2^15
            # and wraps (advisor round-3 high finding). The true per-hop
            # bound is paths_in_flight * (1024 + P2): 2 paths at the
            # 2-stage hop, 5 after scan3_fwd in the 4-stage split.
            if config.cost != "census" or \
                    config.P1 != int(config.P1) or config.P2 != int(config.P2):
                raise ValueError("int16 payload needs census cost and "
                                 "integral P1/P2")
            paths_in_flight = 2 if self.n_stages == 2 else 5
            bound = paths_in_flight * (1024 + config.P2)
            if bound >= 2 ** 15:
                raise ValueError(
                    f"int16 payload would overflow on the wire: "
                    f"paths_in_flight*(1024+P2)={bound:.0f} >= 32768; "
                    f"lower p2 or use payload_dtype='float32'")
            invalid_clamp = 1024.0
        H, W = image_shape
        self.image_shape = (H, W)
        self.payload_mode = payload_mode
        D = config.num_disparities
        S = self.n_stages
        axis_name = axis
        wire_dt = jnp.int16 if payload_dtype == "int16" else jnp.float32

        fwd = [(k, k + 1) for k in range(S - 1)]
        spec_state = P(axis, None, None)
        spec_img = P(axis, None, None)
        spec_out = P(axis, None, None, None)

        if payload_mode == "census":
            branches = make_stage_fns_census(config, image_shape, S,
                                             interpret,
                                             invalid_clamp=invalid_clamp)
            nw = _n_census_words(config.census_window)

            def step_local(state, wstate, lstate, left, right):
                i = jax.lax.axis_index(axis_name)
                my_left = jnp.where(i == 0, left, lstate[0])
                tot, wv, out = jax.lax.switch(
                    i, branches, state[0].astype(jnp.float32), wstate[0],
                    my_left, right)
                return (jax.lax.ppermute(tot.astype(wire_dt), axis_name,
                                         fwd)[None],
                        jax.lax.ppermute(wv, axis_name, fwd)[None],
                        jax.lax.ppermute(my_left, axis_name, fwd)[None],
                        out[None])

            stepped = shard_map(step_local, mesh=mesh,
                                in_specs=(P(axis, None), P(axis, None),
                                          spec_img, P(None, None),
                                          P(None, None)),
                                out_specs=(P(axis, None), P(axis, None),
                                           spec_img, spec_out),
                                check_vma=False)
            self._step = jax.jit(stepped, donate_argnums=(0, 1, 2))
            self._shapes = (S, D * H * W, 2 * nw * H * W)
        else:
            branches = make_stage_fns(config, image_shape, S, interpret,
                                      invalid_clamp=invalid_clamp)

            def step_local(state, lstate, left, right):
                # each frame's left image travels with its activation
                # (stage S-1's WLS guides on *its* frame, not the one
                # being fed now)
                i = jax.lax.axis_index(axis_name)
                my_left = jnp.where(i == 0, left, lstate[0])
                payload, out = jax.lax.switch(i, branches,
                                              state[0].astype(jnp.float32),
                                              my_left, right)
                return (jax.lax.ppermute(payload.astype(wire_dt),
                                         axis_name, fwd)[None],
                        jax.lax.ppermute(my_left, axis_name, fwd)[None],
                        out[None])

            stepped = shard_map(step_local, mesh=mesh,
                                in_specs=(spec_state, spec_img,
                                          P(None, None), P(None, None)),
                                out_specs=(spec_state, spec_img, spec_out),
                                check_vma=False)
            self._step = jax.jit(stepped, donate_argnums=(0, 1))
            self._shapes = (S, 2, D * H * W)
        self._wire_dt = wire_dt
        self.reset()

    def reset(self) -> None:
        """Clear all in-flight activations (called by :meth:`run`, so one
        pipeline instance can stream several independent sequences)."""
        H, W = self.image_shape
        if self.payload_mode == "census":
            S, DHW, WV = self._shapes
            self._state = jnp.zeros((S, DHW), self._wire_dt)
            self._wstate = jnp.zeros((S, WV), jnp.int32)
        else:
            S, two, DHW = self._shapes
            self._state = jnp.zeros((S, two, DHW), self._wire_dt)
        self._lstate = jnp.zeros((S, H, W), jnp.float32)
        self._fed = 0

    def step(self, left, right) -> np.ndarray | None:
        """Feed one frame pair; returns the (2, H, W) [raw, filtered]
        disparity of the frame fed ``n_stages - 1`` steps ago, or None
        while the pipeline is still filling."""
        l = jnp.asarray(np.asarray(left), jnp.float32)
        r = jnp.asarray(np.asarray(right), jnp.float32)
        if self.payload_mode == "census":
            self._state, self._wstate, self._lstate, outs = self._step(
                self._state, self._wstate, self._lstate, l, r)
        else:
            self._state, self._lstate, outs = self._step(self._state,
                                                         self._lstate, l, r)
        self._fed += 1
        if self._fed >= self.n_stages:
            return np.asarray(outs[-1])
        return None

    def run(self, frames) -> list[tuple[np.ndarray, np.ndarray]]:
        """Stream ``frames`` (iterable of (left, right)) through the
        pipeline; returns [(raw, filtered)] per frame, in order. Resets
        first, so back-to-back :meth:`run` calls are independent (stale
        flush activations would otherwise shift every output by
        ``n_stages - 1`` frames)."""
        self.reset()
        results = []
        zero = np.zeros(self.image_shape, np.float32)
        n = 0
        for left, right in frames:
            out = self.step(left, right)
            n += 1
            if out is not None:
                results.append((out[0], out[1]))
        for _ in range(self.n_stages - 1):      # flush
            out = self.step(zero, zero)
            if out is not None and len(results) < n:
                results.append((out[0], out[1]))
        return results


def make_stage_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1-axis ("stage",) mesh over the first ``n_stages`` devices."""
    devices = np.asarray(devices if devices is not None
                         else jax.devices())[:n_stages]
    return Mesh(devices.reshape(n_stages), ("stage",))
