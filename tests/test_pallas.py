"""Pallas SGM kernels vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_match_tpu.ops.pallas_kernels import (
    sgm_aggregate_pallas, sgm_scan3_pallas, sgm_scan_pallas,
)
from stereo_match_tpu.ops.sgm import aggregate_direction, scan_direction, sgm_aggregate


@pytest.fixture()
def vol(rng):
    return jnp.asarray(rng.uniform(0, 24, (16, 24, 40)).astype(np.float32))


def test_scan_forward_matches_reference(vol):
    out = sgm_scan_pallas(vol, None, 8.0, 96.0, interpret=True)
    ref = scan_direction(vol, 8.0, 96.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_scan_reverse_accumulates(vol):
    fwd = sgm_scan_pallas(vol, None, 8.0, 96.0, interpret=True)
    both = sgm_scan_pallas(vol, fwd, 8.0, 96.0, reverse=True, interpret=True)
    ref = scan_direction(vol, 8.0, 96.0) \
        + scan_direction(vol[:, ::-1], 8.0, 96.0)[:, ::-1]
    np.testing.assert_allclose(np.asarray(both), np.asarray(ref), atol=1e-4)


def test_scan3_fused_directions(vol):
    """One fused pass = S + SE + SW of the per-direction reference."""
    out = sgm_scan3_pallas(vol, None, 8.0, 96.0, interpret=True)
    ref = sum(aggregate_direction(vol, dy, dx, 8.0, 96.0)
              for dy, dx in ((1, 0), (1, 1), (1, -1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_scan3_reverse(vol):
    out = sgm_scan3_pallas(vol, None, 8.0, 96.0, reverse=True, interpret=True)
    ref = sum(aggregate_direction(vol, dy, dx, 8.0, 96.0)
              for dy, dx in ((-1, 0), (-1, 1), (-1, -1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize("num_paths", [2, 4, 8])
def test_aggregate_matches_xla(vol, num_paths):
    a = np.asarray(sgm_aggregate(vol, 8.0, 96.0, num_paths))
    b = np.asarray(sgm_aggregate_pallas(vol, 8.0, 96.0, num_paths,
                                        interpret=True))
    np.testing.assert_allclose(b, a, atol=1e-3)


def test_aggregate_odd_sizes(rng):
    vol = jnp.asarray(rng.uniform(0, 24, (8, 37, 23)).astype(np.float32))
    a = np.asarray(sgm_aggregate(vol, 5.0, 40.0, 8))
    b = np.asarray(sgm_aggregate_pallas(vol, 5.0, 40.0, 8, interpret=True))
    np.testing.assert_allclose(b, a, atol=1e-3)


def test_wide_volume_tile_boundary_quality(rng):
    """W > tile_n: diagonal paths reset at tile boundaries; winners must
    still agree almost everywhere with the exact reference."""
    from stereo_match_tpu.data.synthetic import box_scene, random_dot_pair
    from stereo_match_tpu.ops.cost_volume import build_cost_volume
    gt = box_scene(24, 200)
    left, right = random_dot_pair(24, 200, gt, blur=0.8)
    volw = build_cost_volume(jnp.asarray(left), jnp.asarray(right), 16)
    a = np.asarray(sgm_aggregate(volw, 8.0, 96.0, 8))
    b = np.asarray(sgm_aggregate_pallas(volw, 8.0, 96.0, 8, interpret=True,
                                        ))
    # force a tile boundary by monkey-level: tile_n=128 < 200
    from stereo_match_tpu.ops.pallas_kernels import sgm_scan3_pallas, sgm_scan_pallas
    volT = jnp.swapaxes(volw, 1, 2)
    tot = sgm_scan_pallas(volT, None, 8.0, 96.0, interpret=True, tile_n=128)
    tot = sgm_scan_pallas(volT, tot, 8.0, 96.0, reverse=True, interpret=True,
                          tile_n=128)
    total = jnp.swapaxes(tot, 1, 2)
    total = sgm_scan3_pallas(volw, total, 8.0, 96.0, interpret=True, tile_n=128)
    total = sgm_scan3_pallas(volw, total, 8.0, 96.0, reverse=True,
                             interpret=True, tile_n=128)
    agree = (np.argmin(a, 0) == np.argmin(np.asarray(total), 0)).mean()
    assert agree > 0.97, agree


def test_wta_stats_kernel(rng):
    from stereo_match_tpu.ops.pallas_kernels import wta_stats_pallas
    vol = jnp.asarray(rng.uniform(0, 900, (16, 21, 37)).astype(np.float32))
    best, idx, c0, c2, second = wta_stats_pallas(vol, interpret=True)
    v = np.asarray(vol)
    D = 16
    ref_idx = v.argmin(0)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(best), v.min(0))
    mask = np.abs(np.arange(D)[:, None, None] - ref_idx[None]) <= 1
    np.testing.assert_allclose(np.asarray(second),
                               np.where(mask, 3e9, v).min(0))


def test_extract_disparity_fast_matches_reference(rng):
    """The fused Pallas WTA path equals the XLA extract_disparity."""
    from stereo_match_tpu.ops.wta import extract_disparity, extract_disparity_fast
    from stereo_match_tpu.data.synthetic import box_scene, random_dot_pair
    from stereo_match_tpu.ops.cost_volume import build_cost_volume
    from stereo_match_tpu.ops.sgm import sgm_aggregate
    gt = box_scene(40, 56)
    left, right = random_dot_pair(40, 56, gt, blur=0.8)
    vol = build_cost_volume(jnp.asarray(left), jnp.asarray(right), 16)
    agg = sgm_aggregate(vol, 8.0, 96.0, 8)
    for ur, d12, sp in ((0, 1, True), (15, 1, True), (0, -1, False)):
        a = np.asarray(extract_disparity(agg, 0, ur, d12, sp))
        # interpret-mode pallas on CPU
        b = np.asarray(extract_disparity_fast(agg, 0, ur, d12, sp,
                                              interpret=True))
        np.testing.assert_allclose(a, b, equal_nan=True, atol=1e-4)


def test_right_wta_kernel_matches_reference(rng):
    """right_wta_pallas == the XLA shear readout, f32 and int16, odd sizes."""
    from stereo_match_tpu.ops.pallas_kernels import right_wta_pallas
    from stereo_match_tpu.ops.wta import right_disparity_from_volume
    for dtype, shape in ((np.float32, (16, 21, 37)),
                         (np.int16, (16, 21, 37)),
                         (np.float32, (8, 8, 256)),
                         (np.int16, (32, 17, 150))):
        v = rng.integers(0, 900, shape).astype(dtype)
        ref = np.asarray(right_disparity_from_volume(jnp.asarray(v)))
        got = np.asarray(right_wta_pallas(jnp.asarray(v), interpret=True))
        np.testing.assert_array_equal(got.astype(np.float32), ref)


def test_wta_stats_kernel_int16(rng):
    """int16 volumes through the stats kernel (incl. the pad path: odd
    sizes force padding, whose fill must be representable in int16)."""
    from stereo_match_tpu.ops.pallas_kernels import wta_stats_pallas
    v = rng.integers(0, 900, (16, 21, 37)).astype(np.int16)
    best, idx, c0, c2, second = wta_stats_pallas(jnp.asarray(v), interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), v.argmin(0))
    np.testing.assert_allclose(np.asarray(best), v.min(0).astype(np.float32))


def test_extract_disparity_fast_int16(rng):
    """Fast path on an int16 aggregated volume == XLA reference path."""
    from stereo_match_tpu.ops.wta import extract_disparity, extract_disparity_fast
    from stereo_match_tpu.data.synthetic import box_scene, random_dot_pair
    from stereo_match_tpu.ops.cost_volume import build_cost_volume
    gt = box_scene(40, 56)
    left, right = random_dot_pair(40, 56, gt, blur=0.8)
    vol = build_cost_volume(jnp.asarray(left), jnp.asarray(right), 16,
                            dtype="int16")
    agg = sgm_aggregate_pallas(vol, 8.0, 96.0, 8, interpret=True)
    assert agg.dtype == jnp.int16
    a = np.asarray(extract_disparity(agg, 0, 15, 1, True))
    b = np.asarray(extract_disparity_fast(agg, 0, 15, 1, True,
                                          interpret=True))
    np.testing.assert_allclose(a, b, equal_nan=True, atol=1e-4)


@pytest.mark.parametrize("min_d,window", [(0, (5, 5)), (3, (5, 5)),
                                          (0, (7, 9))])
def test_census_volume_pallas_bit_equal(rng, min_d, window):
    """Pallas census builders == XLA census_cost_volume, both layouts."""
    from stereo_match_tpu.ops.census import census_transform
    from stereo_match_tpu.ops.cost_volume import census_cost_volume
    from stereo_match_tpu.ops.pallas_kernels import (
        census_volume_T_pallas, census_volume_pallas)
    H, W, D = 29, 150, 24
    left = rng.uniform(0, 255, (H, W)).astype(np.float32)
    right = rng.uniform(0, 255, (H, W)).astype(np.float32)
    ref = np.asarray(census_cost_volume(left, right, D, min_d, window,
                                        dtype=jnp.int16))
    cl = jnp.moveaxis(census_transform(left, window), -1, 0)
    cr = jnp.moveaxis(census_transform(right, window), -1, 0)
    got = census_volume_pallas(cl, cr, D, min_d, interpret=True)
    np.testing.assert_array_equal(ref, np.asarray(got))
    gotT = census_volume_T_pallas(jnp.swapaxes(cl, 1, 2),
                                  jnp.swapaxes(cr, 1, 2), D, min_d,
                                  interpret=True)
    np.testing.assert_array_equal(ref, np.swapaxes(np.asarray(gotT), 1, 2))


def test_aggregate_with_cost_T(rng):
    """sgm_aggregate_pallas(cost_T=...) == the transpose-internally path."""
    vol = jnp.asarray(rng.uniform(0, 24, (16, 24, 40)).astype(np.float32))
    base = sgm_aggregate_pallas(vol, 8.0, 96.0, 8, interpret=True)
    via_t = sgm_aggregate_pallas(vol, 8.0, 96.0, 8,
                                 cost_T=jnp.swapaxes(vol, 1, 2),
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(via_t))


@pytest.mark.parametrize("dtype", [np.float32, np.int16])
def test_aggregate_wta_fused_stats(rng, dtype):
    """sgm_aggregate_wta_pallas == separate aggregate + wta_stats passes."""
    from stereo_match_tpu.ops.pallas_kernels import (
        sgm_aggregate_wta_pallas, wta_stats_pallas)
    vol = rng.uniform(0, 24, (16, 24, 40)).astype(dtype)
    vol = jnp.asarray(vol)
    agg_ref = sgm_aggregate_pallas(vol, 8.0, 96.0, 8, interpret=True)
    stats_ref = wta_stats_pallas(agg_ref, interpret=True)
    agg, stats = sgm_aggregate_wta_pallas(vol, 8.0, 96.0, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(agg_ref), np.asarray(agg))
    for a, b in zip(stats_ref, stats):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_kitti_width_bit_parity(rng):
    """At production width W=1242 the (raised-VMEM-budget) fitter now
    picks one full-width 1280-lane tile, so the fused diagonal scans have
    NO internal seams: Pallas == XLA bit-exactly, including both
    diagonal pairs and the fused-stats last pass."""
    from stereo_match_tpu.ops.pallas_kernels import (_fit_tile_n,
                                                     sgm_aggregate_wta_pallas,
                                                     wta_stats_pallas)
    assert _fit_tile_n(640, 1242, 128, 8, 4, n_bufs=3, n_scratch=3) == 1280
    D, H, W = 128, 16, 1242
    vol = jnp.asarray(
        rng.integers(0, 900, (D, H, W)).astype(np.float32))
    a = np.asarray(sgm_aggregate(vol, 8.0, 96.0, 8))
    total, stats = sgm_aggregate_wta_pallas(vol, 8.0, 96.0, 8,
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(total), a)
    ref_stats = wta_stats_pallas(jnp.asarray(a), interpret=True)
    for got, want in zip(stats, ref_stats):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mccnn_volume_pallas_matches_xla(rng):
    """Pallas MC-CNN volume builder vs the unrolled XLA build: equal up
    to f32 reduction-order ulps."""
    from stereo_match_tpu.ops.cost_volume import (INVALID_COST,
                                                  _invalid_mask,
                                                  _shift_plane)
    from stereo_match_tpu.ops.pallas_kernels import mccnn_volume_pallas
    F, H, W = 16, 12, 150
    fl = jnp.asarray(rng.normal(size=(F, H, W)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(F, H, W)).astype(np.float32))
    for min_d in (0, 3):
        D = 16
        got = np.asarray(mccnn_volume_pallas(fl, fr, D, min_d, scale=24.0,
                                             interpret=True))

        def plane(d):
            sim = jnp.sum(fl * _shift_plane(fr, d), axis=0)
            return 24.0 * (1.0 - sim) * 0.5

        vol = jnp.stack([plane(min_d + i) for i in range(D)], axis=0)
        mask = _invalid_mask(W, D, min_d)
        want = np.asarray(jnp.where(mask, INVALID_COST, vol))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_mccnn_volume_mxu_matches_vpu(rng):
    """MXU Gram-band builder vs the VPU roll builder: equal up to bf16
    matmul precision on L2-normalized features."""
    from stereo_match_tpu.ops.pallas_kernels import (mccnn_volume_mxu_pallas,
                                                     mccnn_volume_pallas)
    F, H, W = 16, 10, 300
    fl = rng.normal(size=(F, H, W)).astype(np.float32)
    fr = rng.normal(size=(F, H, W)).astype(np.float32)
    fl /= np.linalg.norm(fl, axis=0, keepdims=True)
    fr /= np.linalg.norm(fr, axis=0, keepdims=True)
    D = 128
    want = np.asarray(mccnn_volume_pallas(jnp.asarray(fl), jnp.asarray(fr),
                                          D, 0, scale=24.0, interpret=True))
    got = np.asarray(mccnn_volume_mxu_pallas(jnp.asarray(fl),
                                             jnp.asarray(fr), D,
                                             scale=24.0, interpret=True))
    # invalid cells exactly equal; valid cells within bf16 product error
    inv = want >= 1e4
    np.testing.assert_array_equal(got[inv], want[inv])
    np.testing.assert_allclose(got[~inv], want[~inv], atol=0.15)


def test_fused_census_hpair_bit_parity():
    """sgm_census_hpair_pallas (in-register cost rebuild, no volT in HBM)
    must be bit-identical to census_volume_T_pallas + fwd/rev
    sgm_scan_pallas, incl. min_disparity > 0 and D < 128."""
    from stereo_match_tpu.ops.census import census_transform
    from stereo_match_tpu.ops.pallas_kernels import (
        census_volume_T_pallas, sgm_census_hpair_pallas, sgm_scan_pallas)

    rng = np.random.default_rng(0)
    for (H, W, D, mind) in [(40, 150, 128, 0), (40, 160, 128, 4),
                            (24, 140, 64, 0)]:
        left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
        right = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
        clT = jnp.swapaxes(jnp.moveaxis(
            census_transform(left, (5, 5)), -1, 0), 1, 2)
        crT = jnp.swapaxes(jnp.moveaxis(
            census_transform(right, (5, 5)), -1, 0), 1, 2)
        volT = census_volume_T_pallas(clT, crT, D, mind,
                                      dtype=jnp.float32, interpret=True)
        ref = sgm_scan_pallas(volT, None, 8.0, 32.0, reverse=False,
                              interpret=True)
        ref = sgm_scan_pallas(volT, ref, 8.0, 32.0, reverse=True,
                              interpret=True)
        got = sgm_census_hpair_pallas(clT, crT, D, mind, 8.0, 32.0,
                                      interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_aggregate_wta_census_T_bit_parity():
    """The census_T route through sgm_aggregate_wta_pallas equals the
    cost_T route bitwise (total and all five WTA statistics)."""
    from stereo_match_tpu.ops.census import census_transform
    from stereo_match_tpu.ops.pallas_kernels import (
        census_volume_T_pallas, census_volume_pallas,
        sgm_aggregate_wta_pallas)

    rng = np.random.default_rng(1)
    H, W, D = 36, 150, 128
    left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    cl = jnp.moveaxis(census_transform(left, (5, 5)), -1, 0)
    cr = jnp.moveaxis(census_transform(right, (5, 5)), -1, 0)
    vol = census_volume_pallas(cl, cr, D, 0, dtype=jnp.float32,
                               interpret=True)
    volT = census_volume_T_pallas(jnp.swapaxes(cl, 1, 2),
                                  jnp.swapaxes(cr, 1, 2), D, 0,
                                  dtype=jnp.float32, interpret=True)
    ref_tot, ref_stats = sgm_aggregate_wta_pallas(vol, 8.0, 32.0, 8,
                                                  cost_T=volT,
                                                  interpret=True)
    got_tot, got_stats = sgm_aggregate_wta_pallas(
        vol, 8.0, 32.0, 8, census_T=(jnp.swapaxes(cl, 1, 2),
                                     jnp.swapaxes(cr, 1, 2)),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got_tot), np.asarray(ref_tot))
    for g, r in zip(got_stats, ref_stats):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_scan3_stats_fused_right_wta():
    """The fused right-WTA map of sgm_scan3_stats_pallas (full-width
    single-N-tile case) must equal right_wta_pallas on the same final
    aggregate, and the full _match_core output must be unchanged."""
    from stereo_match_tpu.ops.census import census_transform
    from stereo_match_tpu.ops.pallas_kernels import (
        census_volume_pallas, right_wta_pallas, sgm_scan3_pallas,
        sgm_scan3_stats_pallas, sgm_scan_pallas)

    rng = np.random.default_rng(4)
    H, W, D = 36, 150, 64
    left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    cl = jnp.moveaxis(census_transform(left, (5, 5)), -1, 0)
    cr = jnp.moveaxis(census_transform(right, (5, 5)), -1, 0)
    vol = census_volume_pallas(cl, cr, D, 0, dtype=jnp.float32,
                               interpret=True)
    volT = jnp.swapaxes(vol, 1, 2)
    t = sgm_scan_pallas(volT, None, 8.0, 32.0, reverse=False,
                        interpret=True)
    t = sgm_scan_pallas(volT, t, 8.0, 32.0, reverse=True, interpret=True)
    tot = jnp.swapaxes(t, 1, 2)
    tot = sgm_scan3_pallas(vol, tot, 8.0, 32.0, reverse=False,
                           interpret=True)
    outs = sgm_scan3_stats_pallas(vol, tot, 8.0, 32.0, reverse=True,
                                  interpret=True)
    assert len(outs) == 7          # total + 5 stats + right idx
    agg, ridx = outs[0], outs[6]
    ref = right_wta_pallas(agg, interpret=True)
    np.testing.assert_array_equal(np.asarray(ridx).astype(np.float32),
                                  np.asarray(ref))


def test_production_depth_d160_bit_parity():
    """settings.ini production depth D=160 (not a multiple of 128 —
    `/root/reference/settings.ini:7`): the census builder, the fused
    census h-pair route, and the fused WTA stats must all match the XLA
    reference bit-exactly at a non-power-of-two disparity count."""
    from stereo_match_tpu.ops.census import census_transform
    from stereo_match_tpu.ops.cost_volume import build_cost_volume
    from stereo_match_tpu.ops.pallas_kernels import (
        census_volume_pallas, sgm_aggregate_wta_pallas, wta_stats_pallas)

    rng = np.random.default_rng(0)
    H, W, D = 20, 320, 160
    left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    cl = jnp.moveaxis(census_transform(left, (5, 5)), -1, 0)
    cr = jnp.moveaxis(census_transform(right, (5, 5)), -1, 0)
    vol = census_volume_pallas(cl, cr, D, 0, dtype=jnp.float32,
                               interpret=True)
    vol_ref = build_cost_volume(left, right, num_disparities=D,
                                cost="census", dtype="float32")
    np.testing.assert_array_equal(np.asarray(vol), np.asarray(vol_ref))
    ref = np.asarray(sgm_aggregate(vol, 8.0, 32.0, 8))
    tot, stats = sgm_aggregate_wta_pallas(
        vol, 8.0, 32.0, 8,
        census_T=(jnp.swapaxes(cl, 1, 2), jnp.swapaxes(cr, 1, 2)),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(tot), ref)
    ref_stats = wta_stats_pallas(jnp.asarray(ref), interpret=True)
    for g, r in zip(stats, ref_stats):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_census_words_pallas_bit_equal():
    """The Pallas census transform must equal ops.census.census_transform
    bitwise (row-major bit order, strict less-than, edge replication)
    across window shapes, for both views."""
    from stereo_match_tpu.ops.census import census_transform
    from stereo_match_tpu.ops.pallas_kernels import census_words_pallas

    rng = np.random.default_rng(0)
    for (H, W, win) in [(37, 150, (5, 5)), (24, 140, (3, 3)),
                        (16, 130, (5, 3))]:
        l = rng.uniform(0, 255, (H, W)).astype(np.float32)
        r = rng.uniform(0, 255, (H, W)).astype(np.float32)
        got = np.asarray(census_words_pallas(jnp.stack([l, r]), win,
                                             interpret=True))
        for v, img in ((0, l), (1, r)):
            want = np.asarray(census_transform(jnp.asarray(img), win))[:, :, 0]
            np.testing.assert_array_equal(got[v], want)
    with pytest.raises(ValueError):
        census_words_pallas(jnp.zeros((2, 8, 16)), (7, 7), interpret=True)


def test_lr_mask_pallas_bit_equal():
    """The gather-free rolled disp12 kernel must equal
    ops.wta.lr_consistency_mask bitwise — including NaN invalids and
    exact-.5 subpixel offsets (jnp.round half-even semantics)."""
    from stereo_match_tpu.ops.pallas_kernels import lr_mask_pallas
    from stereo_match_tpu.ops.wta import lr_consistency_mask

    rng = np.random.default_rng(0)
    for (H, W, D, mind, tol) in [(40, 300, 64, 0, 1), (33, 150, 32, 4, 2)]:
        dl = rng.uniform(mind, mind + D - 1, (H, W)).astype(np.float32)
        dl[::5, ::7] = np.round(dl[::5, ::7]) + 0.5
        dl[::9, ::11] = np.nan
        dr = rng.uniform(mind, mind + D - 1, (H, W)).astype(np.float32)
        dr[:, : W // 2] = np.round(dl[:, : W // 2])
        want = np.asarray(lr_consistency_mask(jnp.asarray(dl),
                                              jnp.asarray(dr), tol, mind))
        got = np.asarray(lr_mask_pallas(jnp.asarray(dl), jnp.asarray(dr),
                                        D, tol, mind, interpret=True))
        np.testing.assert_array_equal(got, want)
