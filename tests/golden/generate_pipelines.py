"""Regenerate the pipeline goldens (tests/golden/pipelines_seed42.npz).

Run from the repo root after a *deliberate* behavior change:

    python tests/golden/generate_pipelines.py

The cases mirror tests/test_golden.py::_CASES exactly (full post chains,
scanline on the flagship).  Regenerations must be justified in the commit
message (e.g. the matmul-SAT cumsum reordering, 2026-08-17, which flips
argmin ties at the last ulp of the rectangle sums).
"""

import os

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from stereo_match_traditional_tpu import config as cfgs  # noqa: E402
from stereo_match_traditional_tpu.models import get_pipeline  # noqa: E402
from stereo_match_traditional_tpu.utils.synthetic import make_pair  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "pipelines_seed42.npz"
)

CASES = {
    "sad": cfgs.SADConfig(max_disparity=10, winsize=1, run_post=True),
    "ncc": cfgs.NCCConfig(disp_range=10, win_size=3),
    "asw": cfgs.ASWConfig(disp_range=10, win_size=2, run_post=True, use_pallas=False),
    "ad_census": cfgs.ADCensusConfig(
        disp_range=10, scanline=cfgs.ScanlineConfig(), run_post=True
    ),
    "cblsm": cfgs.CBLSMConfig(disp_range=10, run_post=True),
}


def main():
    L, R, _ = make_pair(48, 64, 10, seed=42)
    arrays = {}
    for name, cfg in sorted(CASES.items()):
        fn, _ = get_pipeline(name)
        res = fn(jnp.asarray(L), jnp.asarray(R), cfg)
        for field in res._fields:
            v = getattr(res, field)
            if v is not None and field.startswith("disp"):
                arrays[f"{name}/{field}"] = np.asarray(v)
        print(name, "done")
    np.savez_compressed(OUT, **arrays)
    print("wrote", OUT, len(arrays), "arrays")


if __name__ == "__main__":
    main()
