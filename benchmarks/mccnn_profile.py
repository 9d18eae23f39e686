"""Stage breakdown of the MC-CNN pipeline on real TPU (round-4 item #1).

Times each piece of the learned-cost path at KITTI shape so the gap
between 21.5 fps (round 3) and the census path's 44.6 fps is attributable:
tower applies (separate vs batched), layout moves, the MXU volume builder,
the volT transpose the SGM stage pays when no cost_T is provided, and the
full pipeline.

Usage: nohup python benchmarks/mccnn_profile.py > /tmp/mccnn_prof.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, D = 375, 1242, 128


def stream_ms(fn, left, right, K=4, reps=3, probe=lambda o: o):
    import jax
    import jax.numpy as jnp
    lefts = jnp.stack([left + i for i in range(K)])
    rights = jnp.stack([right + i for i in range(K)])

    @jax.jit
    def stream(ls, rs):
        def body(i, acc):
            l = jax.lax.dynamic_index_in_dim(ls, i, keepdims=False)
            r = jax.lax.dynamic_index_in_dim(rs, i, keepdims=False)
            out = probe(fn(l, r))
            return acc + jnp.nansum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(stream(lefts, rights))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(stream(lefts, rights))
    return (time.perf_counter() - t0) / (reps * K) * 1e3


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from stereo_match_tpu.config import DisparityConfig
    from stereo_match_tpu.costs import MCCNNCost
    from stereo_match_tpu.data.synthetic import random_dot_pair, slanted_scene
    from stereo_match_tpu.models import mccnn
    from stereo_match_tpu.ops.pallas_kernels import mccnn_volume_mxu_pallas
    from stereo_match_tpu.pipeline.stereo import _match_core

    gt = slanted_scene(H, W, 5.0, 90.0)
    left, right = random_dot_pair(H, W, gt, blur=1.0, seed=1)
    left, right = jnp.asarray(left), jnp.asarray(right)

    model = mccnn.make_model("fast")
    try:
        params = mccnn.load_default_params("fast")
    except FileNotFoundError:
        params = mccnn.init_params(model, jax.random.PRNGKey(0))
    bf = mccnn.MCCNNFeatures(features=model.features,
                             num_layers=model.num_layers,
                             kernel=model.kernel,
                             compute_dtype=jnp.bfloat16)

    rows = {}

    def rec(name, ms):
        rows[name] = round(ms, 3)
        print(f"{name:32s} {ms:8.3f} ms", file=sys.stderr, flush=True)

    def norm(img):
        return (img - jnp.mean(img)) / (jnp.std(img) + 1e-6)

    # 1. two separate applies (current shape of mccnn_cost_volume)
    def apply2(l, r):
        fl = bf.apply(params, norm(l)[None, ..., None])[0]
        fr = bf.apply(params, norm(r)[None, ..., None])[0]
        return fl[..., 0] + fr[..., 0]
    rec("tower_apply_x2", stream_ms(apply2, left, right))

    # 2. one batched apply on the stacked pair
    def applyb(l, r):
        x = jnp.stack([norm(l), norm(r)])[..., None]
        f = bf.apply(params, x)
        return f[0, ..., 0] + f[1, ..., 0]
    rec("tower_apply_batched", stream_ms(applyb, left, right))

    # 3. features -> planes moveaxis -> MXU volume
    def feats(l, r):
        fl = bf.apply(params, norm(l)[None, ..., None])[0]
        fr = bf.apply(params, norm(r)[None, ..., None])[0]
        return jnp.moveaxis(fl, -1, 0), jnp.moveaxis(fr, -1, 0)

    def vol(l, r):
        fl, fr = feats(l, r)
        return mccnn_volume_mxu_pallas(fl, fr, D)
    rec("apply2_planes_mxu_volume", stream_ms(vol, left, right,
                                              probe=lambda v: v[::32, ::64, ::64]))

    # 4. + the volT transpose the SGM stage pays when cost_T is None
    def vol_t(l, r):
        v = vol(l, r)
        return jnp.swapaxes(v, 1, 2)
    rec("volume_plus_transpose", stream_ms(vol_t, left, right,
                                           probe=lambda v: v[::32, ::64, ::64]))

    # 5. full mccnn pipeline (current)
    cfg = DisparityConfig(num_disparities=D, cost="mccnn",
                          uniqueness_ratio=15, disp12_max_diff=1,
                          wls=False, speckle_window_size=0)
    provider = MCCNNCost(model, params, cfg)
    core = functools.partial(_match_core, cfg=cfg, cost_fn=provider)
    rec("mccnn_full_pipeline", stream_ms(lambda l, r: core(l, r)[0],
                                         left, right, K=2))

    # 6. census full pipeline for reference
    ccfg = cfg.replace(cost="census")
    ccore = functools.partial(_match_core, cfg=ccfg)
    rec("census_full_pipeline", stream_ms(lambda l, r: ccore(l, r)[0],
                                          left, right, K=2))

    import json
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
