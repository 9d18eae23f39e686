"""Per-stage timing breakdown of the headline pipeline on real TPU.

Times cumulative prefixes of the match core (cost -> +SGM -> +WTA ->
+LR/full) with the same streaming harness as bench.py, so stage cost =
difference of adjacent rows. Prints a small table to stdout.

Usage: python benchmarks/stagebench.py  (on TPU; first run compiles for
minutes through the remote Mosaic compile server — run under nohup).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, D = 375, 1242, 128


def stream_ms(fn, left, right, K=8, reps=3):
    import jax
    import jax.numpy as jnp
    lefts = jnp.stack([left + i for i in range(K)])
    rights = jnp.stack([right + i for i in range(K)])

    @jax.jit
    def stream(ls, rs):
        def body(i, acc):
            l = jax.lax.dynamic_index_in_dim(ls, i, keepdims=False)
            r = jax.lax.dynamic_index_in_dim(rs, i, keepdims=False)
            out = fn(l, r)
            return acc + jnp.nansum(out[::64, ::64].astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(stream(lefts, rights))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(stream(lefts, rights))
    return (time.perf_counter() - t0) / (reps * K) * 1e3


def main():
    import jax.numpy as jnp
    from stereo_match_tpu.config import DisparityConfig
    from stereo_match_tpu.data.synthetic import random_dot_pair, slanted_scene
    from stereo_match_tpu.ops.cost_volume import build_cost_volume
    from stereo_match_tpu.ops.pallas_kernels import (
        sgm_aggregate_pallas, sgm_scan3_pallas, sgm_scan_pallas,
        wta_stats_pallas)
    from stereo_match_tpu.ops.wta import (extract_disparity_fast,
                                          right_disparity_from_volume)

    cfg = DisparityConfig(num_disparities=D, cost="census",
                          uniqueness_ratio=0, disp12_max_diff=1,
                          wls=False, speckle_window_size=0)
    gt = slanted_scene(H, W, 5.0, 90.0)
    left, right = random_dot_pair(H, W, gt, blur=1.0, seed=1)
    left, right = jnp.asarray(left), jnp.asarray(right)

    def cost(l, r):
        return build_cost_volume(l, r, num_disparities=D, cost="census",
                                 window=cfg.census_window, dtype=cfg.dtype)

    def cost_h(l, r):  # cost + horizontal pair only
        vol = cost(l, r)
        volT = jnp.swapaxes(vol, 1, 2)
        t = sgm_scan_pallas(volT, None, cfg.P1, cfg.P2, reverse=False)
        t = sgm_scan_pallas(volT, t, cfg.P1, cfg.P2, reverse=True)
        return jnp.swapaxes(t, 1, 2)

    def cost_sgm(l, r):
        return sgm_aggregate_pallas(cost(l, r), cfg.P1, cfg.P2, 8)

    def cost_sgm_wta(l, r):
        agg = cost_sgm(l, r)
        best, idx, c0, c2, second = wta_stats_pallas(agg)
        return idx.astype(jnp.float32) + best + c0 + c2 + second

    def cost_sgm_lr(l, r):
        agg = cost_sgm(l, r)
        return right_disparity_from_volume(agg)

    def full(l, r):
        agg = cost_sgm(l, r)
        return extract_disparity_fast(agg, uniqueness_ratio=0,
                                      disp12_max_diff=1)

    stages = [
        ("cost(census,int16)", lambda l, r: cost(l, r)[0]),
        ("cost+sgm_h2", lambda l, r: cost_h(l, r)[0]),
        ("cost+sgm8", lambda l, r: cost_sgm(l, r)[0]),
        ("cost+sgm8+wta_stats", cost_sgm_wta),
        ("cost+sgm8+lr_readout", cost_sgm_lr),
        ("full_extract", full),
    ]
    rows = []
    for name, fn in stages:
        ms = stream_ms(fn, left, right)
        rows.append((name, ms))
        print(f"{name:26s} {ms:8.2f} ms/frame", flush=True)
    print("---- deltas ----")
    for (n0, m0), (n1, m1) in zip(rows, rows[1:]):
        print(f"{n1:26s} +{m1 - m0:7.2f} ms")

    # ---- PRODUCTION path prefixes (the fused program bench.py measures:
    # Pallas census words, census ring h-pair, fused scan3 stats +
    # right-WTA) ----
    from stereo_match_tpu.ops.census import census_transform
    from stereo_match_tpu.ops.pallas_kernels import (
        census_volume_pallas, census_words_pallas,
        sgm_aggregate_wta_pallas)
    from stereo_match_tpu.ops.wta import extract_disparity_fast
    from stereo_match_tpu.config import DisparityConfig as _C
    pcfg = _C(num_disparities=D, cost="census", uniqueness_ratio=15,
              disp12_max_diff=1, wls=False, speckle_window_size=0)

    def words(l, r):
        cw = census_words_pallas(jnp.stack([l, r]), pcfg.census_window)
        return cw[0][None], cw[1][None]

    def p_census_xla(l, r):
        cl = jnp.moveaxis(census_transform(l, pcfg.census_window), -1, 0)
        cr = jnp.moveaxis(census_transform(r, pcfg.census_window), -1, 0)
        return (cl + cr)[0]

    def p_census(l, r):
        cl, cr = words(l, r)
        return (cl + cr)[0]

    def p_vol(l, r):
        cl, cr = words(l, r)
        return census_volume_pallas(cl, cr, D, 0, dtype=jnp.float32)[0]

    def p_agg(l, r):
        cl, cr = words(l, r)
        vol = census_volume_pallas(cl, cr, D, 0, dtype=jnp.float32)
        cT = (jnp.swapaxes(cl, 1, 2), jnp.swapaxes(cr, 1, 2))
        agg, stats = sgm_aggregate_wta_pallas(vol, pcfg.P1, pcfg.P2, 8,
                                              census_T=cT)
        return stats[0]

    def p_full(l, r):
        cl, cr = words(l, r)
        vol = census_volume_pallas(cl, cr, D, 0, dtype=jnp.float32)
        cT = (jnp.swapaxes(cl, 1, 2), jnp.swapaxes(cr, 1, 2))
        agg, stats = sgm_aggregate_wta_pallas(vol, pcfg.P1, pcfg.P2, 8,
                                              census_T=cT)
        return extract_disparity_fast(agg, stats=stats, uniqueness_ratio=15,
                                      disp12_max_diff=1)

    print("---- production (fused) prefixes ----")
    prows = []
    for name, fn in (("census_words_xla", p_census_xla),
                     ("census_words_pallas", p_census), ("..+volume", p_vol),
                     ("..+fused_sgm8_stats", p_agg),
                     ("..+extract(prod)", p_full)):
        ms = stream_ms(fn, left, right)
        prows.append((name, ms))
        print(f"{name:26s} {ms:8.2f} ms/frame", flush=True)
    for (n0, m0), (n1, m1) in zip(prows, prows[1:]):
        print(f"{n1:26s} +{m1 - m0:7.2f} ms")


if __name__ == "__main__":
    sys.exit(main())
