from stereo_match_traditional_tpu.utils import io, synthetic  # noqa: F401
