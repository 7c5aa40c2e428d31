"""Row-sharded post chain (`parallel.post_shard`) vs the untiled chains.

The sharded speckle flood propagates *global* min labels with ppermute
halo merges until a global fixpoint, so its final labels (the component
minimum) and the psum'd area histogram are identical to the untiled run;
fills and medians see halo'd tiles with global-border masking.  The
sharded post is bit-exact given the same disparity inputs, so each test
runs the SAME tiled core twice — gathered post vs sharded post — and
asserts equality (the core's own tie-flip tolerance is covered by
`test_parallel.test_tiled_matches_untiled`).
"""

import jax
import numpy as np
import pytest

from stereo_match_traditional_tpu.config import (
    ADCensusConfig,
    ASWConfig,
    CBLSMConfig,
    SADConfig,
)
from stereo_match_traditional_tpu.parallel.mesh import make_mesh
from stereo_match_traditional_tpu.parallel.tiled import tiled_pipeline
from stereo_match_traditional_tpu.utils.synthetic import make_pair

pytestmark = pytest.mark.slow


def _assert_result_equal(a, b):
    for f in ("disp_left", "disp_right", "disp_final", "occlusion", "mismatch"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )


@pytest.mark.parametrize("rows", [96, 90])  # divisible and padded tiles
def test_ad_census_shard_post_exact(rows):
    left, right, _ = make_pair(rows, 70, 12, seed=11)
    cfg = ADCensusConfig(disp_range=16, run_post=True)
    mesh = make_mesh(8, ("tile",))
    ref = jax.jit(tiled_pipeline("ad_census", cfg, mesh, shard_post=False))(
        left, right
    )
    got = jax.jit(tiled_pipeline("ad_census", cfg, mesh, shard_post=True))(
        left, right
    )
    _assert_result_equal(got, ref)


def test_cblsm_shard_post_exact():
    left, right, _ = make_pair(96, 70, 12, seed=12)
    cfg = CBLSMConfig(disp_range=16, run_post=True)
    mesh = make_mesh(8, ("tile",))
    ref = jax.jit(tiled_pipeline("cblsm", cfg, mesh, shard_post=False))(left, right)
    got = jax.jit(tiled_pipeline("cblsm", cfg, mesh, shard_post=True))(left, right)
    _assert_result_equal(got, ref)


def test_shard_post_unsupported_pipeline_raises():
    mesh = make_mesh(8, ("tile",))
    with pytest.raises(NotImplementedError):
        tiled_pipeline("sad", SADConfig(), mesh, shard_post=True)


def test_asw_shard_post_exact():
    # replicate-border medians + global min-max scale + 4-conn speckles;
    # 90 rows exercises the bottom tile's padding re-replication
    left, right, _ = make_pair(90, 70, 8, seed=13)
    cfg = ASWConfig(disp_range=8, win_size=2, run_post=True)
    mesh = make_mesh(8, ("tile",))
    ref = jax.jit(tiled_pipeline("asw", cfg, mesh, shard_post=False))(left, right)
    got = jax.jit(tiled_pipeline("asw", cfg, mesh, shard_post=True))(left, right)
    _assert_result_equal(got, ref)
