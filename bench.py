"""Headline benchmark: dense SGM disparity fps/chip at KITTI resolution.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the BASELINE.md north-star target of 30 fps/chip at 1242x375,
128 disparities (census cost, 8-path SGM, WTA+subpixel+LR, on-device).

Run on real TPU hardware (no env overrides). Extra detail lines go to
stderr so stdout stays one JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from stereo_match_tpu.pipeline.stereo import _match_core
    from stereo_match_tpu.config import DisparityConfig

    H, W, D = 375, 1242, 128
    rng = np.random.default_rng(0)
    # Structured synthetic scene (texture + disparity ramp) — the timing is
    # content-independent; this avoids shipping dataset bits in-repo.
    from stereo_match_tpu.data.synthetic import random_dot_pair, slanted_scene
    gt = slanted_scene(H, W, 5.0, 90.0)
    left, right = random_dot_pair(H, W, gt, blur=1.0, seed=1)
    left = jnp.asarray(left)
    right = jnp.asarray(right)

    cfg = DisparityConfig(num_disparities=D, cost="census",
                          uniqueness_ratio=0, disp12_max_diff=1,
                          wls=False, speckle_window_size=0)

    import functools
    core = functools.partial(_match_core, cfg=cfg)

    # Streaming harness: K frames per dispatch (the production shape — a
    # video pipeline keeps frames on-device; measuring one dispatch per
    # frame would mostly measure host->device RPC latency, ~40 ms through
    # the axon tunnel, not kernel time).
    K = 10
    lefts = jnp.stack([left + i for i in range(K)])
    rights = jnp.stack([right + i for i in range(K)])

    @jax.jit
    def stream(ls, rs):
        def body(i, acc):
            l = jax.lax.dynamic_index_in_dim(ls, i, keepdims=False)
            r = jax.lax.dynamic_index_in_dim(rs, i, keepdims=False)
            d, _ = core(l, r)
            return acc + jnp.nansum(d[::64, ::64])
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(stream(lefts, rights))  # compile + warm up

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(stream(lefts, rights))
    dt = (time.perf_counter() - t0) / (reps * K)
    fps = 1.0 / dt

    print(f"per-frame: {dt*1e3:.2f} ms on {jax.devices()[0]}", file=sys.stderr)
    print(json.dumps({
        "metric": "kitti_sgm_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s (1242x375, D=128, census+SGM8+WTA)",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
