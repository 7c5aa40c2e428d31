"""Benchmark harness: flagship AD-Census throughput on the default device.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "MPixDisp/s", "vs_baseline": N}

Workload = the reference's committed AD-Census driver
(`AD-CensusV1/main.cpp:58-84`): Teddy-shaped 450x375 pair, dispRange 60,
fused AD+Census9x7 cost L+R, cross-arm rectangle-mean aggregation, dual WTA.
``vs_baseline`` is the ratio to an independent single-threaded C++
re-implementation of the same path with the reference's per-pixel loop
structure (`native/cpu_baseline/ad_census_baseline.cpp`) — the reference
itself publishes no numbers (BASELINE.md).

Usage: python bench.py [--pipeline ad_census] [--iters 12] [--cpu]
"""

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

# Measured on this container's CPU (g++ -O2, best of 3); re-measured live
# when the baseline binary is present/buildable.
_RECORDED_CPU_BASELINE = 4.554  # MPixDisp/s


def _cpu_baseline(rows: int, cols: int, disp: int):
    """CPU-reference MPixDisp/s for the *same* workload shape, or None.

    The baseline binary accepts [rows cols disp]; always pass them so
    ``vs_baseline`` never compares a non-default TPU workload against the
    binary's built-in 375x450x60 defaults (per-pixel census/arm costs are
    not disp-invariant).  The recorded constant only stands in for the
    default shape when the binary cannot be built/run here.
    """
    exe = os.path.join(_REPO, "native", "cpu_baseline", "ad_census_baseline")
    src = exe + ".cpp"
    try:
        if not os.path.exists(exe) and os.path.exists(src):
            subprocess.run(
                ["g++", "-O2", "-o", exe, src], check=True, capture_output=True,
                timeout=120,
            )
        if os.path.exists(exe):
            out = subprocess.run(
                [exe, str(rows), str(cols), str(disp)],
                check=True, capture_output=True, text=True, timeout=300,
            ).stdout
            return float(json.loads(out.strip().splitlines()[-1])["value"])
    except Exception:
        pass
    return _RECORDED_CPU_BASELINE if (rows, cols, disp) == (375, 450, 60) else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", default="ad_census")
    ap.add_argument(
        "--iters", type=int, default=12,
        help="on-device loop count for the high-N timing program "
        "(utils.benchmark.device_time n_hi; raise for steadier numbers)",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (applied via jax.config — an env "
        "override cannot work under this container's sitecustomize)",
    )
    ap.add_argument("--rows", type=int, default=375)
    ap.add_argument("--cols", type=int, default=450)
    ap.add_argument("--disp", type=int, default=60)
    ap.add_argument(
        "--multichip", action="store_true",
        help="also measure the tile-DP sharded path over every available "
        "device and report scaling efficiency vs 1 device",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:  # persistent compile cache: repeated driver runs skip the ~2 min
        # remote compile of the looped benchmark programs
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    from stereo_match_traditional_tpu.models import get_pipeline
    from stereo_match_traditional_tpu.utils.synthetic import make_pair

    from stereo_match_traditional_tpu.config import disp_override_kw

    pipeline, cfg_cls = get_pipeline(args.pipeline)
    cfg = cfg_cls(**disp_override_kw(cfg_cls, args.disp))

    left, right, _ = make_pair(args.rows, args.cols, args.disp, seed=0)
    left = jnp.asarray(left)
    right = jnp.asarray(right)

    # device_time loops the pipeline on-device inside one jit and
    # differences two iteration counts — naive block_until_ready timing
    # only measures the ~30 ms dispatch relay round trip here.
    from stereo_match_traditional_tpu.utils.benchmark import device_time

    def checksum(res):
        # Sum EVERY produced output map: returning only disp_left lets XLA
        # dead-code-eliminate the right-view half (and any active post
        # chain) inside the timing loop, silently inflating the number.
        # Config defaults mirror each reference driver's active path, so
        # the non-None StereoResult fields are exactly that workload.
        total = jnp.float32(0.0)
        for f in res:
            if f is not None:
                total = total + jnp.sum(f.astype(jnp.float32))
        return total

    sec = device_time(
        lambda l, r: checksum(pipeline(l, r, cfg)), (left, right),
        n_hi=max(args.iters, 3),
    )
    mpixdisp = args.rows * args.cols * args.disp / sec / 1e6
    baseline = (
        _cpu_baseline(args.rows, args.cols, args.disp)
        if args.pipeline == "ad_census" else None
    )
    result = {
        "metric": f"{args.pipeline}_throughput",
        "value": round(mpixdisp, 2),
        "unit": "MPixDisp/s",
        "vs_baseline": round(mpixdisp / baseline, 2) if baseline else None,
    }

    if args.multichip and len(jax.devices()) > 1:
        from stereo_match_traditional_tpu.parallel import make_mesh, tiled_pipeline

        n = len(jax.devices())
        mesh = make_mesh(n, ("tile",))
        sharded = jax.jit(tiled_pipeline(args.pipeline, cfg, mesh))
        sec_n = device_time(
            lambda l, r: checksum(sharded(l, r)), (left, right),
            n_hi=max(args.iters, 3),
        )
        result["devices"] = n
        result["sharded_value"] = round(
            args.rows * args.cols * args.disp / sec_n / 1e6, 2
        )
        result["scaling_efficiency"] = round(sec / (sec_n * n), 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
