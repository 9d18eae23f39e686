from stereo_match_tpu.pipeline.stereo import (  # noqa: F401
    StereoMatcher, StereoResult, compute_disparity, run_pipeline,
)
