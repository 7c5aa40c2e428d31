from stereo_match_traditional_tpu.ops import (  # noqa: F401
    aggregate,
    filters,
    post,
    scanline,
    volume,
    wta,
)
