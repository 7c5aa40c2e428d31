from stereo_match_traditional_tpu.parallel.mesh import make_mesh  # noqa: F401
from stereo_match_traditional_tpu.parallel.tiled import (  # noqa: F401
    receptive_field_rows,
    run_tiled,
)
from stereo_match_traditional_tpu.parallel.wta_shard import wta_disparity_sharded  # noqa: F401
