"""Penalty-scale accuracy sweep (VERDICT r3 item 2).

Measures FULL-flagship (scanline + post) bad-2.0 at serving disparity
ranges for ScanlineConfig(penalty_scale in {None, 'auto', floats}) against
the active path's raw-WTA accuracy, on the synthetic suite.  Run on the
real chip:  python _sweep_penalty.py [720p|4k|teddy]
"""
import sys

import jax.numpy as jnp
import numpy as np

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.parallel.streamed import streamed_pipeline
from stereo_match_traditional_tpu.utils.synthetic import bad_pixel_rate, make_pair

SIZES = {
    "teddy": (375, 450, 60, False),
    "720p": (720, 1280, 128, False),
    "4k": (2160, 3840, 256, True),
}


def main(which):
    rows, cols, d, streamed = SIZES[which]
    L, R, gt = make_pair(rows, cols, d, seed=0)
    Lj, Rj = jnp.asarray(L), jnp.asarray(R)
    fn, _ = get_pipeline("ad_census")

    def run(cfg):
        if streamed:
            return streamed_pipeline("ad_census", cfg)(Lj, Rj)  # auto row_tile
        return fn(Lj, Rj, cfg)

    def report(label, res):
        m = res.disp_final if res.disp_final is not None else res.disp_left
        print(f"{which} {label}: bad-2.0 = {bad_pixel_rate(np.asarray(m), gt):.4f}",
              flush=True)

    if not streamed:
        report("active (raw WTA)", run(ADCensusConfig(disp_range=d)))
    scales = (None, "auto") if streamed else (None, "auto", 0.25, 0.5)
    for scale in scales:
        cfg = ADCensusConfig(
            disp_range=d, run_post=True,
            scanline=ScanlineConfig(penalty_scale=scale),
        )
        report(f"FULL scale={scale}", run(cfg))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "720p")
