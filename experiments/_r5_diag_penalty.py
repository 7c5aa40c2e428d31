"""Why does the linear penalty rule fail at D=256?  (VERDICT r4 item 2.)

Hypothesis test: the synthetic pair's ramp has ~24-px features with
amplitude 0.45*D, so the LOCAL DISPARITY SLOPE scales with D
(~1.1 d/px at D=60, ~2.4 at D=128, ~4.8 at D=256) while the scanline's
cheap transitions are fixed at +-1 d/px — beyond |slope| ~ 1 every step
of tracking pays P2 (P1-steps cannot keep up), so ANY positive penalty
flattens the steep ramp and the error is governed by ramp amplitude,
not by the penalty scale.  If true: (a) the FULL-vs-active gap at
D=256 reproduces at small H/W (it is a D property, not a 4K property),
(b) bad pixels concentrate where |grad GT| > 1, (c) no fixed scale
closes the gap.

Runs the DIRECT pipeline at 375x450 for D in {60, 128, 256} over
scales {None, 'auto', 0.5, 0.25, 0.1, 0.05}, prints bad-2.0 overall and
stratified by GT slope (|grad| <= 1 vs > 1), plus each pair's slope
histogram.  Teddy-size volumes at D=256 are ~173 MB — direct fits.
Run on the chip: python experiments/_r5_diag_penalty.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from stereo_match_traditional_tpu.config import ADCensusConfig, ScanlineConfig
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.utils.synthetic import bad_pixel_rate, make_pair

H, W = 375, 450


def main():
    if "cpu" in sys.argv[1:]:
        import jax

        jax.config.update("jax_platforms", "cpu")
    fn, _ = get_pipeline("ad_census")
    for d in (60, 128, 256):
        L, R, gt = make_pair(H, W, d, seed=0)
        gy, gx = np.gradient(gt)
        slope = np.hypot(gy, gx)
        steep = slope > 1.0
        print(f"D={d}: steep-GT fraction {steep.mean():.3f}  "
              f"slope p50/p90 {np.percentile(slope, 50):.2f}/"
              f"{np.percentile(slope, 90):.2f}", flush=True)
        Lj, Rj = jnp.asarray(L), jnp.asarray(R)

        def report(label, m):
            m = np.asarray(m)
            print(f"  D={d} {label}: bad2 {bad_pixel_rate(m, gt):.4f}  "
                  f"flat {bad_pixel_rate(m[~steep], gt[~steep]):.4f}  "
                  f"steep {bad_pixel_rate(m[steep], gt[steep]):.4f}",
                  flush=True)

        res = fn(Lj, Rj, ADCensusConfig(disp_range=d))
        report("active", res.disp_left)
        for scale in (None, "auto", 0.5, 0.25, 0.1, 0.05):
            cfg = ADCensusConfig(
                disp_range=d, run_post=True,
                scanline=ScanlineConfig(penalty_scale=scale),
            )
            report(f"FULL scale={scale}", fn(Lj, Rj, cfg).disp_final)


if __name__ == "__main__":
    main()
