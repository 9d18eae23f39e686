"""Stage-pipelined streaming: parity with the single-chip fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from stereo_match_tpu.config import DisparityConfig
from stereo_match_tpu.data.synthetic import box_scene, random_dot_pair
from stereo_match_tpu.parallel.pipeline_stage import (StreamingPipeline,
                                                      make_stage_fns,
                                                      make_stage_mesh)
from stereo_match_tpu.pipeline.stereo import _match_core

H, W, D = 32, 64, 16


def _frames(k, seed0=7):
    out = []
    for i in range(k):
        gt = box_scene(H, W, 2.0 + i % 3, 8.0 + i % 4)
        out.append(random_dot_pair(H, W, gt, blur=0.8, seed=seed0 + i))
    return out


def _cfg(**kw):
    base = dict(num_disparities=D, cost="census", uniqueness_ratio=15,
                disp12_max_diff=1, wls=False, speckle_window_size=0)
    base.update(kw)
    return DisparityConfig(**base)


@pytest.mark.parametrize("n_stages", [2, 4])
def test_streaming_matches_single_chip(n_stages):
    cfg = _cfg()
    mesh = make_stage_mesh(n_stages)
    pipe = StreamingPipeline(cfg, mesh, image_shape=(H, W))
    frames = _frames(n_stages + 2)
    results = pipe.run(frames)
    assert len(results) == len(frames)
    for (l, r), (raw, filt) in zip(frames, results):
        ref_raw, ref_filt = _match_core(jnp.asarray(l, jnp.float32),
                                        jnp.asarray(r, jnp.float32), cfg)
        np.testing.assert_array_equal(raw, np.asarray(ref_raw))
        np.testing.assert_array_equal(filt, np.asarray(ref_filt))


def test_streaming_with_postprocessing():
    """WLS + speckle run in the final stage, matching _match_core."""
    cfg = _cfg(wls=True, wls_iters=2, speckle_window_size=12,
               speckle_range=2)
    mesh = make_stage_mesh(4)
    pipe = StreamingPipeline(cfg, mesh, image_shape=(H, W))
    frames = _frames(5, seed0=21)
    results = pipe.run(frames)
    for (l, r), (raw, filt) in zip(frames, results):
        ref_raw, ref_filt = _match_core(jnp.asarray(l, jnp.float32),
                                        jnp.asarray(r, jnp.float32), cfg)
        np.testing.assert_allclose(raw, np.asarray(ref_raw), atol=1e-5)
        # WLS inside shard_map compiles with different f32 reduction
        # order; a wrong-frame guide image would be off by whole pixels
        np.testing.assert_allclose(filt, np.asarray(ref_filt), atol=5e-3)
        assert not np.array_equal(raw, filt)


def test_step_latency_contract():
    cfg = _cfg()
    pipe = StreamingPipeline(cfg, make_stage_mesh(4), image_shape=(H, W))
    frames = _frames(6, seed0=40)
    outs = [pipe.step(l, r) for l, r in frames]
    assert all(o is None for o in outs[:3])      # pipeline filling
    assert all(o is not None and o.shape == (2, H, W) for o in outs[3:])


def test_stage_fns_validation():
    with pytest.raises(ValueError):
        make_stage_fns(_cfg(cost="sad"), (H, W), 4, interpret=True)
    with pytest.raises(ValueError):
        make_stage_fns(_cfg(num_paths=4), (H, W), 4, interpret=True)
    with pytest.raises(ValueError):
        make_stage_fns(_cfg(), (H, W), 3, interpret=True)


def test_run_is_reusable():
    """A second run() on the same instance must reset in-flight state
    (advisor round-2 finding: stale flush activations shifted outputs)."""
    cfg = _cfg()
    mesh = make_stage_mesh(2)
    pipe = StreamingPipeline(cfg, mesh, image_shape=(H, W))
    frames = _frames(3, seed0=41)
    first = pipe.run(frames)
    second = pipe.run(frames)
    assert len(first) == len(second) == len(frames)
    for (r1, f1), (r2, f2) in zip(first, second):
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(f1, f2)


@pytest.mark.parametrize("n_stages", [2, 4])
def test_int16_payload_bit_parity(n_stages):
    """int16 hop payload (half the ICI traffic) must be bit-exact vs an
    f32 run with the same clamped invalid sentinel (1024) — the int16
    mode's semantics. The 4-stage case is the one that overflowed with
    the 1e4 sentinel (5 paths in flight at the stage-2->3 hop; advisor
    round-3 high finding)."""
    cfg = _cfg()
    mesh = make_stage_mesh(n_stages)
    frames = _frames(n_stages + 1, seed0=77)
    ref = StreamingPipeline(cfg, mesh, image_shape=(H, W),
                            _invalid_clamp=1024.0).run(frames)
    got = StreamingPipeline(cfg, mesh, image_shape=(H, W),
                            payload_dtype="int16").run(frames)
    for (r1, f1), (r2, f2) in zip(ref, got):
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(f1, f2)


def test_int16_payload_interior_matches_f32_pipeline():
    """The sentinel clamp may only change left-edge columns (x < d for
    most d); interior disparities must equal the default f32 pipeline."""
    cfg = _cfg()
    mesh = make_stage_mesh(2)
    frames = _frames(2, seed0=91)
    ref = StreamingPipeline(cfg, mesh, image_shape=(H, W)).run(frames)
    got = StreamingPipeline(cfg, mesh, image_shape=(H, W),
                            payload_dtype="int16").run(frames)
    for (r1, f1), (r2, f2) in zip(ref, got):
        np.testing.assert_array_equal(r1[:, D:], r2[:, D:])
        np.testing.assert_array_equal(f1[:, D:], f2[:, D:])


def test_int16_payload_overflow_guard():
    """The per-hop bound paths_in_flight*(1024+P2) < 2^15 must reject
    configurations that would wrap on the wire."""
    cfg = _cfg(p1=100, p2=7000)       # 5*(1024+7000) > 32768 at 4 stages
    with pytest.raises(ValueError, match="overflow"):
        StreamingPipeline(cfg, make_stage_mesh(4), image_shape=(H, W),
                          payload_dtype="int16")
    # 2-stage split only has 2 paths in flight: same config is legal
    StreamingPipeline(cfg, make_stage_mesh(2), image_shape=(H, W),
                      payload_dtype="int16")


@pytest.mark.parametrize("n_stages", [2, 4])
def test_census_payload_matches_single_chip(n_stages):
    """payload_mode='census' (wire carries totals + census words; each
    stage rebuilds its volume locally — ~half the ICI traffic) must match
    the single-chip fast path bitwise."""
    cfg = _cfg()
    mesh = make_stage_mesh(n_stages)
    pipe = StreamingPipeline(cfg, mesh, image_shape=(H, W),
                             payload_mode="census")
    frames = _frames(n_stages + 1, seed0=13)
    results = pipe.run(frames)
    assert len(results) == len(frames)
    for (l, r), (raw, filt) in zip(frames, results):
        ref_raw, ref_filt = _match_core(jnp.asarray(l, jnp.float32),
                                        jnp.asarray(r, jnp.float32), cfg)
        np.testing.assert_array_equal(raw, np.asarray(ref_raw))
        np.testing.assert_array_equal(filt, np.asarray(ref_filt))


def test_census_payload_int16_bit_parity():
    """census mode + int16 totals wire == f32 census mode with the
    clamped 1024 sentinel (same invariant as the volume mode)."""
    cfg = _cfg()
    mesh = make_stage_mesh(4)
    frames = _frames(5, seed0=19)
    ref = StreamingPipeline(cfg, mesh, image_shape=(H, W),
                            payload_mode="census",
                            _invalid_clamp=1024.0).run(frames)
    got = StreamingPipeline(cfg, mesh, image_shape=(H, W),
                            payload_mode="census",
                            payload_dtype="int16").run(frames)
    for (r1, f1), (r2, f2) in zip(ref, got):
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(f1, f2)


def test_census_payload_wire_is_smaller():
    """The point of census mode: in-flight wire state is ~half."""
    cfg = _cfg()
    mesh = make_stage_mesh(2)
    vol = StreamingPipeline(cfg, mesh, image_shape=(H, W))
    cen = StreamingPipeline(cfg, mesh, image_shape=(H, W),
                            payload_mode="census")
    vol_bytes = vol._state.size * vol._state.dtype.itemsize
    cen_bytes = (cen._state.size * cen._state.dtype.itemsize
                 + cen._wstate.size * 4)
    assert cen_bytes < 0.62 * vol_bytes, (cen_bytes, vol_bytes)
