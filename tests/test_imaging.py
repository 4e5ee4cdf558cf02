"""Self-contained imaging ops: baseline JPEG encoder (validated against a
standard decoder) and annotation primitives."""
import io

import numpy as np
import pytest

from melogan_tpu.imaging import draw_rect, draw_text, encode_jpeg


def _decode(data: bytes) -> np.ndarray:
    Image = pytest.importorskip("PIL.Image")
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.float64)


def _smooth_image(h=120, w=160):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    gx, gy = np.meshgrid(x, y)
    img = np.stack([gx, gy, np.full((h, w), 128.0)], -1).astype(np.uint8)
    img[30:60, 40:90] = [220, 50, 50]
    return img


def test_jpeg_decodes_with_standard_decoder():
    img = _smooth_image()
    data = encode_jpeg(img, quality=85)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec = _decode(data)
    assert dec.shape == img.shape
    psnr = 10 * np.log10(255**2 / np.mean((dec - img.astype(np.float64)) ** 2))
    assert psnr > 32, f"PSNR {psnr:.1f} dB too low"


def test_jpeg_quality_ladder():
    img = _smooth_image()
    sizes = [len(encode_jpeg(img, q)) for q in (20, 60, 95)]
    assert sizes[0] < sizes[1] < sizes[2]  # higher quality -> more bytes
    dec_lo = _decode(encode_jpeg(img, 20))
    dec_hi = _decode(encode_jpeg(img, 95))
    err_lo = np.mean((dec_lo - img.astype(np.float64)) ** 2)
    err_hi = np.mean((dec_hi - img.astype(np.float64)) ** 2)
    assert err_hi < err_lo


def test_jpeg_non_multiple_of_8_and_grayscale(rng):
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    dec = _decode(encode_jpeg(img, 75))
    assert dec.shape == (37, 53, 3)
    gray = rng.integers(0, 256, (41, 31)).astype(np.uint8)
    dec = _decode(encode_jpeg(gray, 75))
    assert dec.shape == (41, 31, 3)


def test_jpeg_extreme_values():
    for v in (0, 255):
        img = np.full((16, 16, 3), v, np.uint8)
        dec = _decode(encode_jpeg(img, 90))
        assert abs(float(dec.mean()) - v) < 3


def test_draw_rect_and_text():
    img = np.zeros((60, 80, 3), np.uint8)
    draw_rect(img, 10, 10, 50, 40, color=(0, 255, 0), thickness=2)
    assert (img[10, 10:51, 1] == 255).all()  # top edge
    assert (img[10:41, 50, 1] == 255).all()  # right edge
    assert img[25, 30, 1] == 0  # interior untouched
    draw_text(img, "happy 9%", 2, 45, color=(255, 0, 0))
    assert (img[45:, :, 0] == 255).sum() > 20  # glyph pixels rendered
    # out-of-bounds draw must not raise
    draw_rect(img, -5, -5, 200, 200)
    draw_text(img, "calm", 70, 55)


# ---------------------------------------------------------------------------
# Native C++ JPEG twin (native/jpeg_codec.cpp): the MJPEG hot path.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def native_jpeg():
    from melogan_tpu.imaging.native import encode_jpeg_native, get_lib

    if get_lib() is None:
        pytest.skip("native JPEG library unavailable (no g++?)")
    return encode_jpeg_native


def test_native_matches_python_bytes(native_jpeg, rng):
    """Byte-identical output on a fixed corpus at standard qualities (at
    q>90, quantizer rounding ties can legally differ by one step — covered
    by the decode-equality test below)."""
    from melogan_tpu.imaging.jpeg import _encode_jpeg_py

    images = [
        _smooth_image(),
        rng.integers(0, 256, (37, 53, 3)).astype(np.uint8),
        np.zeros((16, 16, 3), np.uint8),
        np.full((64, 48, 3), 255, np.uint8),
    ]
    for q in (20, 80):
        for img in images:
            assert native_jpeg(img, q) == _encode_jpeg_py(img, q)


def test_native_decode_equivalence_high_quality(native_jpeg, rng):
    from melogan_tpu.imaging.jpeg import _encode_jpeg_py

    img = _smooth_image()
    a = _decode(native_jpeg(img, 95))
    b = _decode(_encode_jpeg_py(img, 95))
    assert np.max(np.abs(a - b)) <= 4  # rounding ties differ by <=1 quant step


def test_encode_jpeg_dispatches_to_native(native_jpeg):
    """The public encode_jpeg uses the native path when available."""
    import time

    from melogan_tpu.imaging import encode_jpeg

    img = _smooth_image(240, 320)
    t0 = time.perf_counter()
    data = encode_jpeg(img, 85)
    dt = time.perf_counter() - t0
    assert data[:2] == b"\xff\xd8"
    assert dt < 0.05, f"dispatch took {dt*1000:.0f} ms — native path not used?"
    dec = _decode(data)
    psnr = 10 * np.log10(255**2 / np.mean((dec - img.astype(np.float64)) ** 2))
    assert psnr > 32


def test_native_grayscale_via_dispatcher(native_jpeg, rng):
    from melogan_tpu.imaging import encode_jpeg

    gray = rng.integers(0, 256, (41, 31)).astype(np.uint8)
    dec = _decode(encode_jpeg(gray, 75))
    assert dec.shape == (41, 31, 3)


# ---------------------------------------------------------------------------
# YUV4MPEG2 codec: real-video frame source for /video_feed
# ---------------------------------------------------------------------------


def _rand_frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_y4m_roundtrip_c444(tmp_path):
    from melogan_tpu.imaging.y4m import read_y4m, write_y4m

    frames = _rand_frames(3, 24, 32)
    p = tmp_path / "clip.y4m"
    with open(p, "wb") as f:
        n = write_y4m(f, frames, rate=(25, 1), colorspace="444")
    assert n == 3
    with open(p, "rb") as f:
        hdr, it = read_y4m(f)
        out = list(it)
    assert hdr["W"] == 32 and hdr["H"] == 24 and hdr["F"] == (25, 1)
    assert len(out) == 3
    for a, b in zip(frames, out):
        # BT.601 limited-range quantization costs a couple of code values
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 3


def test_y4m_roundtrip_c420_smooth_content(tmp_path):
    from melogan_tpu.imaging.y4m import read_y4m, write_y4m

    # smooth gradient: 2x2-mean chroma subsampling is near-lossless here
    yy, xx = np.mgrid[0:32, 0:48]
    frame = np.stack([xx * 5 % 256, yy * 7 % 256, (xx + yy) * 3 % 256],
                     axis=-1).astype(np.uint8)
    p = tmp_path / "c420.y4m"
    with open(p, "wb") as f:
        write_y4m(f, [frame], colorspace="420")
    with open(p, "rb") as f:
        hdr, it = read_y4m(f)
        (out,) = list(it)
    assert hdr["C"] == "420" and out.shape == frame.shape
    assert np.abs(frame.astype(int) - out.astype(int)).mean() < 8.0


def test_y4m_reader_handles_colorspace_variants(tmp_path):
    """C420jpeg/C420mpeg2 differ only in chroma siting — same plane sizes."""
    from melogan_tpu.imaging.y4m import read_y4m

    import io

    h, w = 4, 6
    for cs in (b"C420jpeg", b"C420mpeg2", b"C420paldv", b"C422", b"Cmono"):
        chroma = {b"C422": (w // 2) * h}.get(cs, (w // 2) * (h // 2))
        if cs == b"Cmono":
            chroma = 0
        buf = (b"YUV4MPEG2 W6 H4 F30:1 " + cs + b"\nFRAME\n"
               + bytes([128]) * (w * h) + bytes([128]) * (2 * chroma))
        hdr, it = read_y4m(io.BytesIO(buf))
        (frame,) = list(it)
        assert frame.shape == (4, 6, 3)


def test_y4m_malformed_fails_typed(tmp_path):
    import io

    from melogan_tpu.imaging.y4m import Y4MError, read_y4m, write_y4m

    with pytest.raises(Y4MError):
        read_y4m(io.BytesIO(b"NOTY4M W2 H2\n"))
    with pytest.raises(Y4MError):
        read_y4m(io.BytesIO(b"YUV4MPEG2 F30:1\n"))  # no geometry
    with pytest.raises(Y4MError):
        read_y4m(io.BytesIO(b"YUV4MPEG2 W2 H2 C999\n"))
    # truncated mid-frame: typed error, not garbage frames
    frames = _rand_frames(2, 8, 8)
    buf = io.BytesIO()
    write_y4m(buf, frames, colorspace="444")
    data = buf.getvalue()[:-17]
    hdr, it = read_y4m(io.BytesIO(data))
    with pytest.raises(Y4MError):
        list(it)
    # headerless / empty
    with pytest.raises(Y4MError):
        read_y4m(io.BytesIO(b""))
    # non-positive frame rate (F is advertised metadata; a zero denominator
    # must fail at parse, not when a consumer divides by it)
    with pytest.raises(Y4MError):
        read_y4m(io.BytesIO(b"YUV4MPEG2 W2 H2 F30:0 C444\n"))
    with pytest.raises(Y4MError):
        read_y4m(io.BytesIO(b"YUV4MPEG2 W2 H2 F-1:1 C444\n"))


def test_y4m_rejects_high_bit_depth_and_alpha_colorspaces():
    """C420p10/C422p12/C444alpha carry 2-byte samples or a 4th plane —
    prefix-matching them as 8-bit would decode garbage frames and then die
    mid-stream on a misleading 'bad frame marker'; they must fail fast as
    unsupported at header parse (regression: C420p10 used to pass as C420)."""
    import io

    from melogan_tpu.imaging.y4m import Y4MError, read_y4m

    for cs in (b"C420p10", b"C420p12", b"C420p16", b"C422p10", b"C444p10",
               b"C444alpha", b"C420junk"):
        with pytest.raises(Y4MError, match="unsupported colorspace"):
            read_y4m(io.BytesIO(b"YUV4MPEG2 W4 H4 F25:1 " + cs + b"\n"))


def test_y4m_frame_source_loops_and_reiterates(tmp_path):
    from melogan_tpu.imaging.y4m import Y4MFrameSource, write_y4m

    frames = _rand_frames(2, 8, 8, seed=3)
    p = tmp_path / "loop.y4m"
    with open(p, "wb") as f:
        write_y4m(f, frames, colorspace="444")
    src = Y4MFrameSource(str(p), loop=True)
    assert (src.width, src.height) == (8, 8) and src.rate == (30, 1)
    it = iter(src)
    got = [next(it) for _ in range(5)]  # loops past EOF
    assert np.array_equal(got[0], got[2]) and np.array_equal(got[1], got[3])
    # independent concurrent iterations (one per /video_feed connection)
    it2 = iter(src)
    assert np.array_equal(next(it2), got[0])
    # non-looping source terminates
    finite = list(iter(Y4MFrameSource(str(p), loop=False)))
    assert len(finite) == 2
    # a bad path fails at construction (serve() fails fast, not first viewer)
    with pytest.raises((OSError, ValueError)):
        Y4MFrameSource(str(tmp_path / "missing.y4m"))


def test_y4m_random_bytes_fuzz():
    """Arbitrary bytes either parse (possibly zero frames) or fail typed —
    never an uncaught TypeError/struct garbage (house parser-fuzz rule)."""
    import io

    from melogan_tpu.imaging.y4m import Y4MError, read_y4m

    rng = np.random.default_rng(0xF422)
    for i in range(300):
        n = int(rng.integers(0, 400))
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        prefix = b"" if i % 3 == 0 else b"YUV4MPEG2 "
        try:
            _, frames = read_y4m(io.BytesIO(prefix + blob))
            for frame in frames:
                assert frame.dtype == np.uint8 and frame.ndim == 3
        except Y4MError:
            pass
