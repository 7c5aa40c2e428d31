"""CLI, checkpointing, profiling and benchmark-utility tests."""

import json
import os

import numpy as np
import pytest

from stereo_match_traditional_tpu.models.base import StereoResult
from stereo_match_traditional_tpu.utils import checkpoint
from stereo_match_traditional_tpu.utils.profiling import StageTimer


def test_cli_run_synthetic(tmp_path, capsys):
    from stereo_match_traditional_tpu import cli

    out = tmp_path / "disp.png"
    stages = tmp_path / "stages"
    rc = cli.main(
        [
            "run", "sad", "--synthetic", "48x64", "--disp-range", "10",
            "--out", str(out), "--save-stages", str(stages),
        ]
    )
    assert rc == 0
    assert out.exists()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["shape"] == [48, 64]
    assert summary["bad_2.0"] < 0.3
    assert (stages / "manifest.json").exists()


def test_cli_run_real_image_files(tmp_path, capsys):
    """File round trip (the reference's imread -> compute -> imwrite loop):
    PNGs in, normalized-u8 disparity PNG out (`SAD/SADmain.cpp:27-28,86-95`)."""
    from stereo_match_traditional_tpu import cli
    from stereo_match_traditional_tpu.utils import io
    from stereo_match_traditional_tpu.utils.synthetic import make_pair

    L, R, _ = make_pair(48, 64, 10, seed=3)
    lp, rp, out = tmp_path / "l.png", tmp_path / "r.png", tmp_path / "d.png"
    io.imwrite(str(lp), L)
    io.imwrite(str(rp), R)
    rc = cli.main(
        [
            "run", "sad", "--left", str(lp), "--right", str(rp),
            "--disp-range", "10", "--out", str(out),
        ]
    )
    assert rc == 0
    disp = io.imread(str(out))
    assert disp.shape[:2] == (48, 64) and disp.dtype == np.uint8
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["shape"] == [48, 64]


def test_cli_run_streamed_executor(capsys):
    from stereo_match_traditional_tpu import cli

    rc = cli.main(
        [
            "run", "sad", "--synthetic", "40x48", "--disp-range", "8",
            "--executor", "streamed", "--row-tile", "16",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["shape"] == [40, 48]
    assert summary["bad_2.0"] < 0.4


def test_cli_save_stages_requires_direct():
    import pytest

    from stereo_match_traditional_tpu import cli

    with pytest.raises(SystemExit):
        cli.main(
            [
                "run", "sad", "--synthetic", "32x40", "--executor", "streamed",
                "--save-stages", "/tmp/should_not_exist",
            ]
        )


def test_cli_set_overrides(capsys):
    from stereo_match_traditional_tpu import cli

    rc = cli.main(
        [
            "run", "sad", "--synthetic", "32x48", "--disp-range", "8",
            "--set", "winsize=1", "--set", "subpixel=true",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["shape"] == [32, 48]


def test_cli_unknown_field_errors():
    from stereo_match_traditional_tpu import cli

    with pytest.raises(SystemExit):
        cli.main(["run", "sad", "--synthetic", "16x32", "--set", "bogus=1"])


def test_checkpoint_roundtrip(tmp_path):
    res = StereoResult(
        disp_left=np.arange(12.0).reshape(3, 4),
        disp_right=np.ones((3, 4)),
        disp_final=None,
        occlusion=np.zeros((3, 4), bool),
        mismatch=None,
    )
    d = str(tmp_path / "ckpt")
    checkpoint.save_result(d, res, meta={"pipeline": "test"})
    loaded = checkpoint.load_result(d)
    np.testing.assert_array_equal(loaded.disp_left, res.disp_left)
    np.testing.assert_array_equal(loaded.occlusion, res.occlusion)
    assert loaded.disp_final is None
    assert loaded.mismatch is None
    assert checkpoint.has_stage(d, "disp_left")
    assert not checkpoint.has_stage(d, "disp_final")


def test_stage_timer_reports_json():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = json.loads(t.report())
    assert set(rep["stages_ms"]) == {"a", "b"}


def test_device_time_sane_on_cpu():
    import jax.numpy as jnp

    from stereo_match_traditional_tpu.utils.benchmark import device_time

    x = jnp.ones((64, 128), jnp.float32)
    t = device_time(lambda a: a * 2.0 + 1.0, (x,), n_lo=1, n_hi=64, reps=2)
    assert 0 < t < 0.1


def test_cli_asw_lab_variant_executors(capsys):
    """`stereo run asw --set variant=lab` builds the OpenCV-u8-Lab pair
    from the (synthetic color) inputs and routes it through each
    executor's aux-input path; direct and tiled must agree."""
    import pytest

    from stereo_match_traditional_tpu import cli

    outs = {}
    for ex in ("direct", "tiled"):
        rc = cli.main(
            [
                "run", "asw", "--synthetic", "32x44", "--disp-range", "8",
                "--set", "variant=lab", "--set", "win_size=2",
                "--executor", ex,
            ]
        )
        assert rc == 0
        outs[ex] = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert outs["direct"]["bad_2.0"] == pytest.approx(outs["tiled"]["bad_2.0"], abs=5e-3)
