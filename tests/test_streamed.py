"""Single-chip streamed (row-band lax.map) execution == untiled pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_match_traditional_tpu import config as cfgs
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.parallel import run_streamed
from stereo_match_traditional_tpu.utils.synthetic import make_pair


def _mismatch(a, b, ignore_cols=0, side="left"):
    """Trim the ill-defined clamp triangle: the left `ignore_cols` columns
    for left-view maps, the right ones for the mirrored right view."""
    sl = slice(ignore_cols, None) if side == "left" else slice(None, -ignore_cols or None)
    a = np.asarray(a)[:, sl]
    b = np.asarray(b)[:, sl]
    return float(np.mean(a != b))


@pytest.mark.parametrize(
    "name,cfg,exact",
    [
        ("sad", cfgs.SADConfig(max_disparity=10, winsize=1), True),
        pytest.param("ad_census", cfgs.ADCensusConfig(disp_range=10), False,
                     marks=pytest.mark.slow),
        ("cblsm", cfgs.CBLSMConfig(disp_range=10), False),
        pytest.param("asw", cfgs.ASWConfig(disp_range=10, win_size=2,
                     use_pallas=False), False, marks=pytest.mark.slow),
        ("ncc", cfgs.NCCConfig(disp_range=10, win_size=2), False),
    ],
)
def test_streamed_matches_untiled(name, cfg, exact):
    L, R, _ = make_pair(53, 64, 10, seed=1)  # non-multiple of the band size
    fn, _ = get_pipeline(name)
    want = fn(jnp.asarray(L), jnp.asarray(R), cfg)
    got = run_streamed(name, L, R, cfg, row_tile=16)
    d_range = getattr(cfg, "disp_range", getattr(cfg, "max_disparity", 0))
    for field in ("disp_left", "disp_right", "disp_final"):
        w = getattr(want, field)
        g = getattr(got, field)
        assert (w is None) == (g is None), field
        if w is None:
            continue
        frac = _mismatch(
            g, w, ignore_cols=d_range,
            side="right" if field == "disp_right" else "left",
        )
        if exact:
            assert frac == 0.0, (field, frac)
        else:
            assert frac <= 5e-3, (field, frac)


def test_streamed_rejects_scanline():
    cfg = cfgs.ADCensusConfig(disp_range=8, scanline=cfgs.ScanlineConfig())
    L, R, _ = make_pair(32, 40, 8, seed=2)
    with pytest.raises(NotImplementedError):
        run_streamed("ad_census", L, R, cfg)
