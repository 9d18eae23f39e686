"""Clean-chip MC-CNN full-pipeline fps (K=4), for BENCH_DETAILS patching."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _scene, _stream_fps, D  # noqa: E402


def main():
    import functools

    import jax
    from stereo_match_tpu.config import DisparityConfig
    from stereo_match_tpu.costs import MCCNNCost
    from stereo_match_tpu.models import mccnn
    from stereo_match_tpu.pipeline.stereo import _match_core

    left, right, _ = _scene()
    base = DisparityConfig(num_disparities=D, uniqueness_ratio=15,
                           disp12_max_diff=1, speckle_window_size=0,
                           wls=False, cost="mccnn")
    rows = {}
    for arch in ("fast", "accurate"):
        model = mccnn.make_model(arch)
        try:
            params = mccnn.load_default_params(arch)
        except FileNotFoundError:
            params = mccnn.init_params(model, jax.random.PRNGKey(0))
        provider = MCCNNCost(model, params, base)
        core = functools.partial(_match_core, cfg=base, cost_fn=provider)
        fps = _stream_fps(lambda l, r: core(l, r)[0], left, right, K=4,
                          reps=2)
        rows[f"mccnn_{arch}_sgm8"] = round(fps, 2)
        print(f"mccnn_{arch}_sgm8  {fps:7.2f} fps", file=sys.stderr,
              flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
