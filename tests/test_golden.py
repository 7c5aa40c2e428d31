"""Golden regression tests: frozen disparity outputs for all five pipelines.

Guards behavior across refactors/optimization passes — these arrays were
produced by the oracle-validated implementations (every stage has its own
unit test against `tests/oracles.py`); any future change that shifts a
single pixel of any pipeline output fails here and must either be a bug or
consciously regenerate the goldens (see the generation snippet in git
history, commit message of this file).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_match_traditional_tpu import config as cfgs
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.utils.synthetic import make_pair

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pipelines_seed42.npz")

_CASES = {
    "sad": cfgs.SADConfig(max_disparity=10, winsize=1, run_post=True),
    "ncc": cfgs.NCCConfig(disp_range=10, win_size=3),
    "asw": cfgs.ASWConfig(disp_range=10, win_size=2, run_post=True, use_pallas=False),
    "ad_census": cfgs.ADCensusConfig(
        disp_range=10, scanline=cfgs.ScanlineConfig(), run_post=True
    ),
    "cblsm": cfgs.CBLSMConfig(disp_range=10, run_post=True),
}


@pytest.fixture(scope="module")
def golden():
    return np.load(_GOLDEN)


@pytest.mark.parametrize("name", sorted(_CASES))
def test_pipeline_matches_golden(name, golden):
    L, R, _ = make_pair(48, 64, 10, seed=42)
    fn, _ = get_pipeline(name)
    res = fn(jnp.asarray(L), jnp.asarray(R), _CASES[name])
    checked = 0
    for field in res._fields:
        key = f"{name}/{field}"
        if key not in golden.files:
            continue
        got = np.asarray(getattr(res, field))
        want = golden[key]
        # exact equality, treating equal-position infs as equal
        finite = np.isfinite(want)
        np.testing.assert_array_equal(np.isfinite(got), finite, err_msg=key)
        np.testing.assert_allclose(
            got[finite], want[finite], rtol=0, atol=1e-5, err_msg=key
        )
        checked += 1
    assert checked >= 1, name
