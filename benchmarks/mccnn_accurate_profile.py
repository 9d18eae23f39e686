"""Stage costs of the fused MC-CNN `accurate` path (5x112) on real TPU.

The round-4 bench left mccnn_accurate_sgm8 at 28.37 fps — the only
config under the 30 fps bar. This isolates where the 5x112 tower's time
goes (MXU conv work vs per-row emit overhead vs slab traffic) and sweeps
the tower block height s_out (halo recompute amortization: a block of
s_out output rows computes s_out + 2L - 2 layer-1 rows).

Usage: nohup python benchmarks/mccnn_accurate_profile.py > /tmp/acc_prof.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, D = 375, 1242, 128


def stream_ms(fn, *args, K=4, reps=3, probe=lambda o: o):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def stream(a0, *rest):
        def body(i, acc):
            out = probe(fn(a0 + i.astype(a0.dtype), *rest))
            return acc + jnp.nansum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(stream(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(stream(*args))
    return (time.perf_counter() - t0) / (reps * K) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from stereo_match_tpu.models import mccnn
    from stereo_match_tpu.ops.pallas_kernels import (
        mccnn_tower_pallas, mccnn_volume_flat_pallas)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (2, H, W)), jnp.float32)
    model = mccnn.make_model("accurate")
    try:
        params = mccnn.load_default_params("accurate")
    except FileNotFoundError:
        params = mccnn.init_params(model, jax.random.PRNGKey(0))
    w1, w3, b = mccnn._tower_weight_stacks(model, params)
    L, F = model.num_layers, model.features

    for s_out in (16, 32, 48):
        def tower(im, s=s_out):
            return mccnn_tower_pallas(im, w1, w3, b, num_layers=L,
                                      features=F, s_out=s)
        ms = stream_ms(tower, imgs, probe=lambda f: f[:, ::512, ::256])
        print(f"tower_accurate_s{s_out:<3d}    {ms:8.3f} ms", flush=True)

    best_s = 16
    feats = mccnn_tower_pallas(imgs, w1, w3, b, num_layers=L, features=F,
                               s_out=best_s)
    f0, f1 = feats[0], feats[1]

    def vol(a, b2):
        return mccnn_volume_flat_pallas(a, b2, D, H, W, F)

    ms = stream_ms(vol, f0, f1, probe=lambda v: v[::32, ::64, ::64])
    print(f"volume_flat_F112       {ms:8.3f} ms", flush=True)

    def both(im):
        f = mccnn_tower_pallas(im, w1, w3, b, num_layers=L, features=F,
                               s_out=best_s)
        return mccnn_volume_flat_pallas(f[0], f[1], D, H, W, F)

    ms = stream_ms(both, imgs, probe=lambda v: v[::32, ::64, ::64])
    print(f"tower_plus_volume      {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
