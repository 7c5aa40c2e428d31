"""Native host runtime (C++/ctypes) vs the NumPy implementations."""

import numpy as np
import pytest

from stereo_match_traditional_tpu.utils import io as io_utils
from stereo_match_traditional_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)

rng = np.random.default_rng(0)


def test_rgb_to_gray_matches_numpy():
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    got = native.rgb_to_gray_u8(img)
    want = io_utils.rgb_to_gray_u8(img)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1  # rounding ties


def test_rgb_to_lab_matches_numpy():
    img = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
    got = native.rgb_to_lab_u8(img)
    want = io_utils.rgb_to_lab_u8(img)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_replicate_pad_matches_numpy():
    img = rng.integers(0, 256, (11, 17), dtype=np.uint8)
    got = native.replicate_pad_u8(img, 4)
    want = io_utils.replicate_pad(img, 4)
    np.testing.assert_array_equal(got, want)


def test_normalize_matches_numpy():
    x = rng.standard_normal((19, 23)).astype(np.float32) * 30
    x[2, 3] = np.inf
    got = native.normalize_u8(x)
    want = io_utils.normalize_u8(x)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_median3():
    img = rng.integers(0, 256, (15, 18), dtype=np.uint8)
    got = native.median3_u8(img)
    # oracle: replicate-border 3x3 median
    pad = np.pad(img, 1, mode="edge")
    want = np.empty_like(img)
    for i in range(15):
        for j in range(18):
            want[i, j] = np.median(pad[i : i + 3, j : j + 3])
    np.testing.assert_array_equal(got, want)


def test_pnm_roundtrip(tmp_path):
    gray = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    color = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    p1 = str(tmp_path / "g.pgm")
    p2 = str(tmp_path / "c.ppm")
    native.write_pnm(p1, gray)
    native.write_pnm(p2, color)
    np.testing.assert_array_equal(native.read_pnm(p1), gray)
    np.testing.assert_array_equal(native.read_pnm(p2), color)


def test_pfm_roundtrip_native(tmp_path):
    gray = rng.standard_normal((9, 13)).astype(np.float32)
    color = rng.standard_normal((7, 5, 3)).astype(np.float32)
    p1 = str(tmp_path / "g.pfm")
    p2 = str(tmp_path / "c.pfm")
    native.write_pfm(p1, gray)
    native.write_pfm(p2, color)
    np.testing.assert_array_equal(native.read_pfm(p1), gray)
    np.testing.assert_array_equal(native.read_pfm(p2), color)


def test_pfm_native_python_cross_compat(tmp_path):
    data = rng.standard_normal((11, 6)).astype(np.float32)
    pn = str(tmp_path / "n.pfm")
    pp = str(tmp_path / "p.pfm")
    native.write_pfm(pn, data)
    np.testing.assert_array_equal(io_utils.read_pfm(pn), data)
    io_utils.write_pfm(pp, data)
    np.testing.assert_array_equal(native.read_pfm(pp), data)


def test_pfm_native_reads_big_endian(tmp_path):
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "be.pfm")
    with open(p, "wb") as f:
        f.write(b"Pf\n4 3\n1.0\n")
        f.write(data[::-1].astype(">f4").tobytes())
    np.testing.assert_array_equal(native.read_pfm(p), data)


def test_pfm_native_crlf_header(tmp_path):
    data = np.arange(6, dtype=np.float32).reshape(2, 3)
    p = str(tmp_path / "crlf.pfm")
    with open(p, "wb") as f:
        f.write(b"Pf\r\n3 2\r\n-1.0\r\n")
        f.write(data[::-1].astype("<f4").tobytes())
    np.testing.assert_array_equal(native.read_pfm(p), data)


def test_pair_loader_in_order(tmp_path):
    pairs = []
    imgs = []
    for k in range(6):
        l = rng.integers(0, 256, (10, 12), dtype=np.uint8)
        r = rng.integers(0, 256, (10, 12), dtype=np.uint8)
        lp = str(tmp_path / f"l{k}.pgm")
        rp = str(tmp_path / f"r{k}.pgm")
        native.write_pnm(lp, l)
        native.write_pnm(rp, r)
        pairs.append((lp, rp))
        imgs.append((l, r))
    loader = native.PairLoader(pairs, threads=3, depth=2)
    out = list(loader)
    assert len(out) == 6
    for (gl, gr), (wl, wr) in zip(out, imgs):
        np.testing.assert_array_equal(gl, wl)
        np.testing.assert_array_equal(gr, wr)


def test_pair_loader_color_gray_conversion(tmp_path):
    color = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    lp = str(tmp_path / "l.ppm")
    rp = str(tmp_path / "r.ppm")
    native.write_pnm(lp, color)
    native.write_pnm(rp, color)
    loader = native.PairLoader([(lp, rp)])
    gl, gr = next(iter(loader))
    want = io_utils.rgb_to_gray_u8(color)
    assert np.abs(gl.astype(int) - want.astype(int)).max() <= 1
    loader.close()


def test_pair_loader_grows_buffer_for_oversized_pair(tmp_path):
    """An image larger than max_bytes must not be dropped from the stream:
    the C side keeps it queued on -3 and reports the needed geometry, and
    the Python side regrows its buffers and retries."""
    big = rng.integers(0, 256, (40, 50), dtype=np.uint8)
    small = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    pairs = []
    for k, img in enumerate((big, small)):
        lp = str(tmp_path / f"ol{k}.pgm")
        rp = str(tmp_path / f"or{k}.pgm")
        native.write_pnm(lp, img)
        native.write_pnm(rp, img)
        pairs.append((lp, rp))
    loader = native.PairLoader(pairs, threads=1, max_bytes=small.size)
    out = list(loader)
    assert len(out) == 2
    np.testing.assert_array_equal(out[0][0], big)
    np.testing.assert_array_equal(out[1][0], small)
