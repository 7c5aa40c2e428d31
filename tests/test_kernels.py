"""Pallas kernels vs their jnp reference ops (interpreter mode on CPU).

The same kernel code compiles for real TPU (SURVEY.md §4: one code path,
two execution targets).
"""

import numpy as np
import pytest

from stereo_match_traditional_tpu.ops import volume
from stereo_match_traditional_tpu.ops.kernels import asw_volume_pallas
from stereo_match_traditional_tpu.utils.synthetic import make_pair


def test_asw_pallas_matches_jnp_left():
    L, R, _ = make_pair(14, 18, 5, seed=2)
    want = np.asarray(
        volume.asw_volume(L, R, 5, win_size=2, space_sigma=50, color_sigma=30, truncation=40)
    )
    got = np.asarray(asw_volume_pallas(L, R, 5, 2, 50.0, 30.0, 40.0, "left"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_asw_pallas_matches_jnp_right():
    L, R, _ = make_pair(12, 20, 4, seed=5)
    want = np.asarray(
        volume.asw_volume_right(
            L, R, 4, win_size=1, space_sigma=50, color_sigma=30, truncation=40
        )
    )
    got = np.asarray(asw_volume_pallas(L, R, 4, 1, 50.0, 30.0, 40.0, "right"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_asw_pallas_default_params_shape():
    """Reference-default geometry: 25x25 window, uneven tile remainders."""
    L, R, _ = make_pair(20, 30, 6, seed=1)
    got = np.asarray(asw_volume_pallas(L, R, 6, 11, 50.0, 30.0, 40.0, "left"))
    want = np.asarray(volume.asw_volume(L, R, 6, 11, 50.0, 30.0, 40.0))
    assert got.shape == (6, 20, 30)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
