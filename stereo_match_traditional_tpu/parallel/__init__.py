from stereo_match_traditional_tpu.parallel.gspmd import gspmd_pipeline  # noqa: F401
from stereo_match_traditional_tpu.parallel.halo import (  # noqa: F401
    add_row_halo,
    crop_row_halo,
)
from stereo_match_traditional_tpu.parallel.mesh import make_mesh  # noqa: F401
from stereo_match_traditional_tpu.parallel.scan_carry import (  # noqa: F401
    scanline_optimize_sharded,
)
from stereo_match_traditional_tpu.parallel.tiled import (  # noqa: F401
    ad_census_tile_disp,
    receptive_field_rows,
    run_tiled,
    tiled_pipeline,
)
from stereo_match_traditional_tpu.parallel.streamed import (  # noqa: F401
    auto_row_tile,
    run_streamed,
    streamed_canonical_staged,
    streamed_pipeline,
)
from stereo_match_traditional_tpu.parallel.wta_shard import (  # noqa: F401
    optimal_disparity_sharded,
    wta_sharded,
)
from stereo_match_traditional_tpu.parallel.distributed import (  # noqa: F401
    host_chip_mesh,
    initialize,
)
