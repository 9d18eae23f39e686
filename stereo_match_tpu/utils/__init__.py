from stereo_match_tpu.utils import handy  # noqa: F401
from stereo_match_tpu.utils.profiling import StageTimer, trace_stage  # noqa: F401
