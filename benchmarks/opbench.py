"""Micro-benchmarks of individual hot ops on real TPU (streamed dispatch).

Times each op in isolation with the bench.py streaming harness so the
~40 ms tunnel RPC amortizes away. Volume ops take the int16 census volume
as input (K copies resident in HBM).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, D = 375, 1242, 128


def stream_ms(fn, x, K=4, reps=3):
    import jax
    import jax.numpy as jnp
    xs = jnp.stack([x + i for i in range(K)])

    @jax.jit
    def stream(v):
        def body(i, acc):
            xi = jax.lax.dynamic_index_in_dim(v, i, keepdims=False)
            out = fn(xi)
            return acc + jnp.sum(out[..., ::64, ::64].astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(stream(xs))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(stream(xs))
    return (time.perf_counter() - t0) / (reps * K) * 1e3


def main():
    import jax.numpy as jnp
    from stereo_match_tpu.config import DisparityConfig
    from stereo_match_tpu.data.synthetic import random_dot_pair, slanted_scene
    from stereo_match_tpu.ops.census import census_transform
    from stereo_match_tpu.ops.cost_volume import build_cost_volume
    from stereo_match_tpu.ops.pallas_kernels import (
        sgm_scan3_pallas, sgm_scan_pallas, wta_stats_pallas)
    from stereo_match_tpu.ops.wta import right_disparity_from_volume

    cfg = DisparityConfig(num_disparities=D, cost="census",
                          uniqueness_ratio=0, disp12_max_diff=1,
                          wls=False, speckle_window_size=0)
    gt = slanted_scene(H, W, 5.0, 90.0)
    left, right = random_dot_pair(H, W, gt, blur=1.0, seed=1)
    left, right = jnp.asarray(left), jnp.asarray(right)
    vol = build_cost_volume(left, right, num_disparities=D, cost="census",
                            window=cfg.census_window, dtype="int16")
    vol.block_until_ready()
    volT = jnp.swapaxes(vol, 1, 2)
    p1, p2 = cfg.P1, cfg.P2

    cases = [
        ("census_transform(l)", lambda l: census_transform(l, (5, 5)), left),
        ("swapaxes12_int16", lambda v: jnp.swapaxes(v, 1, 2), vol),
        ("scan_init_fwd(volT)", lambda v: sgm_scan_pallas(v, None, p1, p2), volT),
        ("scan_accum_rev(volT)",
         lambda v: sgm_scan_pallas(v, v, p1, p2, reverse=True), volT),
        ("scan3_accum_fwd", lambda v: sgm_scan3_pallas(v, v, p1, p2), vol),
        ("scan3_tile1280",
         lambda v: sgm_scan3_pallas(v, v, p1, p2, tile_n=1280), vol),
        ("wta_stats", lambda v: wta_stats_pallas(v)[0], vol),
        ("lr_readout", right_disparity_from_volume, vol),
    ]
    for name, fn, x in cases:
        ms = stream_ms(fn, x)
        print(f"{name:26s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
