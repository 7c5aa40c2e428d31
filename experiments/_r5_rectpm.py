"""Pixel-major rect corner picks A/B (VERDICT r4 item 4).

Measures cblsm and the ad_census active flagship e2e (no-DCE checksums,
device_time) with the rect SAT+picks in d-major (current) vs pixel-major
(D padded to 64 lanes; free reshapes/slices) layouts, at Teddy and
720p/D=128.  Run on the real chip: python experiments/_r5_rectpm.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

import stereo_match_traditional_tpu.ops.aggregate as aggregate
from stereo_match_traditional_tpu.config import disp_override_kw
from stereo_match_traditional_tpu.models import get_pipeline
from stereo_match_traditional_tpu.utils.benchmark import device_time
from stereo_match_traditional_tpu.utils.synthetic import make_pair


def checksum(fn, cfg):
    def run(l, r):
        res = fn(l, r, cfg)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in res if x is not None)
    return run


def main():
    for rows, cols, d, names in (
        (375, 450, 60, ("cblsm", "ad_census")),
        (720, 1280, 128, ("ad_census",)),
    ):
        L, R, _ = make_pair(rows, cols, d, seed=0)
        Lj, Rj = jnp.asarray(L), jnp.asarray(R)
        for name in names:
            fn, cfg_cls = get_pipeline(name)
            cfg = cfg_cls(**disp_override_kw(cfg_cls, d))
            for pm in (False, True):
                aggregate._RECT_PM_AUTO = pm
                kw = dict(n_lo=1, n_hi=3, reps=2) if rows > 400 else {}
                sec = device_time(checksum(fn, cfg), (Lj, Rj), **kw)
                print(f"{name} {rows}x{cols}/D={d} pm={pm}: "
                      f"{sec*1e3:.2f} ms  {rows*cols*d/sec/1e6:.0f} MPixDisp/s",
                      flush=True)
            aggregate._RECT_PM_AUTO = False


if __name__ == "__main__":
    main()
