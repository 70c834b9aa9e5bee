"""Real stdlib codecs for the multimodal processors: PPM/BMP image
decode + resize and WAV PCM audio features run genuinely (synthesized
bytes, value-checked against numpy), the fake/real plumbing stays
schema-identical, and unsupported formats still gate loudly on the named
third-party dependency."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import Row

from flink_invoice_processor_spark.functions import multimodal as MM


def ppm_bytes(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.astype(
        np.uint8
    ).tobytes()


def bmp_bytes(img: np.ndarray) -> bytes:
    """Minimal bottom-up uncompressed 24bpp BMP."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    px = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up rows, BGR
        row = img[y, :, ::-1].astype(np.uint8).tobytes()
        px += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(px), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 0, 0, 0, 0)
    )
    return header + bytes(px)


def png_bytes(
    img: np.ndarray, filters: list[int] | None = None,
    depth: int = 8, ctype: int | None = None, interlace: int = 0,
) -> bytes:
    """Spec-conformant PNG encoder (zlib + forward filtering per PNG spec
    §9) so the stdlib decoder is value-checked against ground truth on
    every filter type, not just filter 0."""
    import zlib

    h, w, bpp = img.shape
    if ctype is None:
        ctype = 2 if bpp == 3 else 6
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * bpp, np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        f = filters[y]
        out = line.copy()
        for x in range(w * bpp):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            else:
                pred = 0
            out[x] = (line[x] - pred) % 256
        raw += bytes([f]) + out.astype(np.uint8).tobytes()
        prev = line

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def palette_png_bytes(
    idx: np.ndarray,
    plte: np.ndarray,
    depth: int = 8,
    filters: list[int] | None = None,
    include_plte: bool = True,
) -> bytes:
    """Spec-conformant PALETTE (color type 3) PNG encoder: indices
    packed ``depth`` bits per pixel MSB-first, rows byte-aligned,
    byte-wise forward filtering with the 1-byte pixel step."""
    import zlib

    h, w = idx.shape
    rows = []
    for y in range(h):
        if depth == 8:
            rows.append(idx[y].astype(np.uint8))
        else:
            bits = (
                (idx[y][:, None] >> np.arange(depth - 1, -1, -1)) & 1
            ).astype(np.uint8).reshape(-1)
            rows.append(np.packbits(bits))
    stride = len(rows[0])
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        line = rows[y].astype(np.int32)
        f = filters[y]
        out = line.copy()
        for x in range(stride):
            a = int(line[x - 1]) if x >= 1 else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x >= 1 else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            else:
                pred = 0
            out[x] = (line[x] - pred) % 256
        raw += bytes([f]) + out.astype(np.uint8).tobytes()
        prev = line

    def chunk(tag: bytes, body: bytes) -> bytes:
        import zlib as _z

        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _z.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    parts = [b"\x89PNG\r\n\x1a\n", chunk(b"IHDR", ihdr)]
    if include_plte:
        parts.append(chunk(b"PLTE", plte.astype(np.uint8).tobytes()))
    parts += [chunk(b"IDAT", zlib.compress(bytes(raw))), chunk(b"IEND", b"")]
    return b"".join(parts)


def wav_bytes(samples: np.ndarray, rate: int = 8000, ch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


@pytest.fixture()
def img(spark):
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)


def media_df(spark, rows):
    return spark.createDataFrame(
        [Row(media_id=i, media=b, media_type=t, meta={}) for i, b, t in rows],
        MM.MEDIA_SCHEMA,
    )


def test_real_decode_ppm_and_bmp(spark, img):
    df = media_df(
        spark,
        [(1, ppm_bytes(img), "image"), (2, bmp_bytes(img), "image")],
    )
    out = {r.media_id: r for r in MM.decode_images(df, backend="real").collect()}
    expect = [float(img[:, :, c].mean()) / 255.0 for c in range(3)] + [
        float(img[:, :, c].std()) / 255.0 for c in range(3)
    ]
    for mid in (1, 2):
        r = out[mid]
        assert (r.width, r.height, r.n_channels) == (4, 5, 3)
        assert np.allclose(r.features[:6], expect, atol=1e-6)
        assert r.features[6:] == [0.0, 0.0]


def test_real_decode_png_all_filters(spark, img):
    """Every PNG filter type (None/Sub/Up/Average/Paeth) round-trips to
    the exact source pixels, RGB and RGBA (alpha dropped)."""
    rgba = np.dstack([img, np.full(img.shape[:2], 200, np.uint8)])
    df = media_df(
        spark,
        [(1, png_bytes(img, filters=[0, 1, 2, 3, 4]), "image"),
         (2, png_bytes(rgba, filters=[4, 3, 2, 1, 0]), "image")],
    )
    out = {r.media_id: r for r in MM.decode_images(df, backend="real").collect()}
    expect = [float(img[:, :, c].mean()) / 255.0 for c in range(3)] + [
        float(img[:, :, c].std()) / 255.0 for c in range(3)
    ]
    for mid in (1, 2):
        r = out[mid]
        assert (r.width, r.height, r.n_channels) == (4, 5, 3)
        assert np.allclose(r.features[:6], expect, atol=1e-6)


def test_real_png_pixel_exact_roundtrip(img):
    for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5,
                    [0, 4, 1, 3, 2]):
        assert np.array_equal(
            MM._decode_rgb(png_bytes(img, filters=list(filters))), img
        )
    rgba = np.dstack([img, np.arange(20, dtype=np.uint8).reshape(5, 4)])
    assert np.array_equal(
        MM._decode_rgb(png_bytes(rgba, filters=[4] * 5)), img
    )


def test_real_png_resize(spark, img):
    df = media_df(spark, [(1, png_bytes(img, filters=[2] * 5), "image")])
    out = MM.resize_images(df, width=2, height=3, backend="real").collect()[0]
    got = MM._decode_rgb(bytes(out.media))
    ys = np.arange(3) * 5 // 3
    xs = np.arange(2) * 4 // 2
    assert np.array_equal(got, img[ys][:, xs])


def test_real_png_truncated_and_corrupt_gate_loudly(img):
    """Partial downloads must hit the module's named gate, not leak a
    raw struct.error/zlib.error out of the Arrow worker."""
    whole = png_bytes(img)
    with pytest.raises(NotImplementedError, match="truncated|corrupt"):
        MM._decode_rgb(whole[:20])  # cut mid-IHDR
    # corrupt the IDAT payload bytes (keep signature + IHDR intact)
    broken = bytearray(whole)
    broken[45:49] = b"\x00\x00\x00\x00"
    with pytest.raises(NotImplementedError):
        MM._decode_rgb(bytes(broken))


def test_real_png_unsupported_variants_gate_on_pillow(img):
    # every spec-LEGAL PNG now decodes stdlib-pure; spec-illegal combos
    # (e.g. 16-bit palette) still gate loudly by name
    with pytest.raises(NotImplementedError, match="Pillow"):
        MM._decode_rgb(png_bytes(img, ctype=3, depth=16))
    # an interlace FLAG on sequentially-laid-out scanlines is a corrupt
    # file: the Adam7 pass sizes can't add up
    with pytest.raises(NotImplementedError, match="mismatch|corrupt"):
        MM._decode_rgb(png_bytes(img, interlace=1))


def _filtered_raw(rows: np.ndarray, bpp: int, filters: list[int]) -> bytes:
    """Byte-wise PNG forward filtering (spec §9) over pre-packed scanline
    bytes — shared by the grayscale/16-bit encoders below."""
    h, stride = rows.shape
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        line = rows[y].astype(np.int32)
        f = filters[y]
        out = line.copy()
        for x in range(stride):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            else:
                pred = 0
            out[x] = (line[x] - pred) % 256
        raw += bytes([f]) + out.astype(np.uint8).tobytes()
        prev = line
    return bytes(raw)


def _png_from_rows(
    rows: np.ndarray, w: int, bpp: int, depth: int, ctype: int,
    filters: list[int],
) -> bytes:
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    raw = _filtered_raw(rows, bpp, filters)
    ihdr = struct.pack(">IIBBBBB", w, rows.shape[0], depth, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def gray_png_bytes(
    g: np.ndarray, depth: int = 8, alpha: np.ndarray | None = None,
    filters: list[int] | None = None,
) -> bytes:
    """Spec-conformant grayscale (color type 0) / gray+alpha (color type
    4) PNG encoder at depths 1/2/4/8/16."""
    h, w = g.shape
    filters = filters or [0] * h
    if depth < 8:
        assert alpha is None
        rows = []
        for y in range(h):
            bits = (
                (g[y][:, None] >> np.arange(depth - 1, -1, -1)) & 1
            ).astype(np.uint8).reshape(-1)
            rows.append(np.packbits(bits))
        return _png_from_rows(np.stack(rows), w, 1, depth, 0, filters)
    ctype = 0 if alpha is None else 4
    chans = [g] if alpha is None else [g, alpha]
    if depth == 8:
        rows = np.stack(chans, axis=2).reshape(h, -1).astype(np.uint8)
        return _png_from_rows(rows, w, len(chans), 8, ctype, filters)
    # 16-bit big-endian samples
    s16 = np.stack(chans, axis=2).astype(">u2")
    rows = s16.reshape(h, -1).view(np.uint8).reshape(h, -1)
    return _png_from_rows(rows, w, 2 * len(chans), 16, ctype, filters)


def rgb16_png_bytes(
    img16: np.ndarray, filters: list[int] | None = None,
) -> bytes:
    """16-bit truecolor(+alpha) PNG encoder (color type 2 or 6)."""
    h, w, nch = img16.shape
    filters = filters or [0] * h
    rows = img16.astype(">u2").reshape(h, -1).view(np.uint8).reshape(h, -1)
    return _png_from_rows(
        rows, w, 2 * nch, 16, 2 if nch == 3 else 6, filters
    )


def test_real_gray_png_pixel_exact_all_depths():
    """Grayscale PNG decodes stdlib-pure and value-exact at every legal
    depth, across all filter types; sub-byte samples rescale linearly
    (255/(2^d−1) exactly — identical to spec bit replication)."""
    rng = np.random.default_rng(13)
    for depth in (1, 2, 4, 8):
        hi = 1 << depth
        g = rng.integers(0, hi, size=(5, 4), dtype=np.uint8)
        want8 = (g.astype(np.uint16) * (255 // (hi - 1))).astype(np.uint8)
        want = np.repeat(want8[:, :, None], 3, axis=2)
        for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5,
                        [0, 4, 1, 3, 2]):
            got = MM._decode_rgb(
                gray_png_bytes(g, depth=depth, filters=list(filters))
            )
            assert np.array_equal(got, want), f"depth={depth} f={filters}"


def test_real_gray_alpha_png_drops_alpha():
    rng = np.random.default_rng(17)
    g = rng.integers(0, 256, size=(5, 4), dtype=np.uint8)
    a = rng.integers(0, 256, size=(5, 4), dtype=np.uint8)
    want = np.repeat(g[:, :, None], 3, axis=2)
    for filters in ([0] * 5, [4] * 5, [0, 4, 1, 3, 2]):
        got = MM._decode_rgb(
            gray_png_bytes(g, alpha=a, filters=list(filters))
        )
        assert np.array_equal(got, want)


def test_real_16bit_png_takes_high_byte(img):
    """16-bit samples reduce to their high byte (spec §13.12): a 16-bit
    image built as v*257 round-trips to the 8-bit original, gray and
    truecolor(+alpha), every filter type."""
    rng = np.random.default_rng(19)
    g = rng.integers(0, 256, size=(5, 4), dtype=np.uint16)
    # non-trivial low bytes: high byte must win, not rounding
    g16 = g * 256 + rng.integers(0, 256, size=(5, 4), dtype=np.uint16)
    for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5):
        got = MM._decode_rgb(
            gray_png_bytes(g16, depth=16, filters=list(filters))
        )
        assert np.array_equal(
            got, np.repeat(g.astype(np.uint8)[:, :, None], 3, axis=2)
        )
    img16 = img.astype(np.uint16) * 256 + 173
    for filters in ([0] * 5, [4] * 5, [0, 4, 1, 3, 2]):
        assert np.array_equal(
            MM._decode_rgb(rgb16_png_bytes(img16, filters=list(filters))),
            img,
        )
    rgba16 = np.dstack([img16, np.full(img.shape[:2], 9999, np.uint16)])
    assert np.array_equal(
        MM._decode_rgb(rgb16_png_bytes(rgba16, filters=[3] * 5)), img
    )


def test_real_palette_png_pixel_exact_all_depths(img):
    """Palette PNG decodes stdlib-pure (no Pillow in this container) and
    value-exact at every legal palette depth, across all filter types."""
    rng = np.random.default_rng(11)
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    for depth, ncolors in ((1, 2), (2, 4), (4, 16), (8, 16)):
        idx = rng.integers(0, ncolors, size=(5, 4), dtype=np.uint8)
        for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5,
                        [0, 4, 1, 3, 2]):
            got = MM._decode_rgb(
                palette_png_bytes(
                    idx, plte[:ncolors], depth=depth, filters=list(filters)
                )
            )
            assert np.array_equal(got, plte[:ncolors][idx]), (
                f"depth={depth} filters={filters}"
            )


def test_real_palette_png_corrupt_gates_loudly():
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    plte = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    with pytest.raises(NotImplementedError, match="PLTE"):
        MM._decode_rgb(palette_png_bytes(idx, plte, include_plte=False))
    # index beyond the palette: 1-entry PLTE, indices reach 1
    with pytest.raises(NotImplementedError, match="PLTE range"):
        MM._decode_rgb(palette_png_bytes(idx, plte[:1]))


def test_real_decode_unsupported_format_gates_on_pillow(spark):
    df = media_df(spark, [(1, b"\x89PNG\r\n" + b"x" * 50, "image")])
    with pytest.raises(Exception, match="Pillow"):
        MM.decode_images(df, backend="real").collect()


def test_real_resize_nearest_neighbor_roundtrip(spark, img):
    df = media_df(spark, [(1, ppm_bytes(img), "image")])
    out = MM.resize_images(df, width=2, height=3, backend="real").collect()[0]
    assert out.meta["format"] == "ppm" and out.meta["resized"] == "true"
    # re-decode the emitted PPM and check exact nearest-neighbor pixels
    got = MM._decode_rgb(bytes(out.media))
    ys = np.arange(3) * 5 // 3
    xs = np.arange(2) * 4 // 2
    assert got.shape == (3, 2, 3)
    assert np.array_equal(got, img[ys][:, xs])


def test_real_wav_features(spark):
    rate = 8000
    t = np.arange(rate)  # 1 s
    samples = (np.sin(2 * np.pi * 440 * t / rate) * 16000).astype("<i2")
    stereo = np.repeat(samples, 2)  # L == R
    df = media_df(
        spark,
        [(1, wav_bytes(samples, rate), "audio"),
         (2, wav_bytes(stereo, rate, ch=2), "audio")],
    )
    out = {
        r.media_id: r
        for r in MM.extract_audio_features(df, backend="real").collect()
    }
    mono = samples.astype("float32") / 32768.0
    bounds = np.linspace(0, len(mono), 5).astype(int)
    expect = [
        float(np.sqrt((mono[bounds[i]:bounds[i + 1]] ** 2).mean()))
        for i in range(4)
    ]
    for mid in (1, 2):  # stereo downmixes to the same mono signal
        r = out[mid]
        assert (r.duration_ms, r.sample_rate) == (1000, rate)
        assert np.allclose(r.mfcc, expect, atol=1e-6)


def test_real_wav_width_gate(spark):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)  # 8-bit: not the stdlib path
        wf.setframerate(8000)
        wf.writeframes(b"\x80" * 100)
    df = media_df(spark, [(1, buf.getvalue(), "audio")])
    with pytest.raises(Exception, match="torchaudio|librosa"):
        MM.extract_audio_features(df, backend="real").collect()


def test_fake_real_schema_parity(spark, img):
    """The two backends must agree on schema and partition-safe plan
    shape — swapping backends can never break a downstream pipeline."""
    df = media_df(
        spark,
        [(1, ppm_bytes(img), "image"),
         (2, wav_bytes(np.zeros(10, dtype="<i2")), "audio")],
    )
    for fn, kw in [
        (MM.decode_images, {}),
        (MM.extract_audio_features, {}),
        (MM.resize_images, {"width": 2, "height": 2}),
    ]:
        fake = fn(df, backend="fake", **kw)
        real = fn(df, backend="real", **kw)
        assert fake.schema == real.schema
        real.collect()  # and the real path actually runs on these bytes


def test_video_stays_gated(spark):
    df = media_df(spark, [(1, b"xx", "video")])
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        MM.sample_frames(df, backend="real")


_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def adam7_png_bytes(
    arr: np.ndarray, depth: int = 8, ctype: int = 2,
    plte: np.ndarray | None = None, pass_filters: list[int] | None = None,
) -> bytes:
    """Spec-conformant Adam7-interlaced PNG encoder: each pass is an
    independently filtered sub-image, concatenated in stream order."""
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    pf = pass_filters or [0, 1, 2, 3, 4, 1, 2]
    raw = bytearray()
    for i, (x0, y0, dx, dy) in enumerate(_ADAM7_PASSES):
        sub = arr[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        if depth < 8:
            rows = []
            for y in range(ph):
                bits = (
                    (sub[y, :, 0][:, None]
                     >> np.arange(depth - 1, -1, -1)) & 1
                ).astype(np.uint8).reshape(-1)
                rows.append(np.packbits(bits))
            rows, bpp = np.stack(rows), 1
        elif depth == 16:
            rows = sub.astype(">u2").reshape(ph, -1).view(
                np.uint8
            ).reshape(ph, -1)
            bpp = 2 * nch
        else:
            rows = sub.reshape(ph, -1).astype(np.uint8)
            bpp = nch
        raw += _filtered_raw(rows, bpp, [pf[i % len(pf)]] * ph)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    parts = [
        b"\x89PNG\r\n\x1a\n",
        chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1)),
    ]
    if plte is not None:
        parts.append(chunk(b"PLTE", plte.astype(np.uint8).tobytes()))
    parts += [
        chunk(b"IDAT", zlib.compress(bytes(raw))), chunk(b"IEND", b""),
    ]
    return b"".join(parts)


def test_real_adam7_rgb_roundtrip():
    """Adam7-interlaced truecolor decodes pixel-exact — 10x9 exercises
    all 7 passes with ragged pass dimensions, and every filter type
    appears on some pass."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(9, 10, 3), dtype=np.uint8)
    assert np.array_equal(MM._decode_rgb(adam7_png_bytes(img)), img)
    rgba = np.dstack([img, rng.integers(0, 256, (9, 10), dtype=np.uint8)])
    assert np.array_equal(
        MM._decode_rgb(adam7_png_bytes(rgba, ctype=6)), img
    )


def test_real_adam7_small_images_skip_empty_passes():
    # 1x1 has six empty passes; 3x2 leaves several empty too
    px = np.array([[[7, 8, 9]]], dtype=np.uint8)
    assert np.array_equal(MM._decode_rgb(adam7_png_bytes(px)), px)
    rng = np.random.default_rng(29)
    small = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    assert np.array_equal(MM._decode_rgb(adam7_png_bytes(small)), small)


def test_real_adam7_gray_palette_and_16bit():
    rng = np.random.default_rng(31)
    # 4-bit grayscale: exact linear rescale after pass reassembly
    g4 = rng.integers(0, 16, size=(9, 10), dtype=np.uint8)
    want = np.repeat((g4 * 17)[:, :, None], 3, axis=2)
    assert np.array_equal(
        MM._decode_rgb(adam7_png_bytes(g4, depth=4, ctype=0)), want
    )
    # 2-bit palette
    plte = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(9, 10), dtype=np.uint8)
    assert np.array_equal(
        MM._decode_rgb(adam7_png_bytes(idx, depth=2, ctype=3, plte=plte)),
        plte[idx],
    )
    # 16-bit RGB: high byte wins per pass
    img = rng.integers(0, 256, size=(9, 10, 3), dtype=np.uint16)
    img16 = img * 256 + rng.integers(0, 256, size=(9, 10, 3))
    assert np.array_equal(
        MM._decode_rgb(adam7_png_bytes(img16, depth=16, ctype=2)),
        img.astype(np.uint8),
    )


def ppm16_bytes(img16: np.ndarray, maxval: int = 65535) -> bytes:
    """P6 with maxval > 255: 2-byte big-endian samples (PPM spec)."""
    h, w = img16.shape[:2]
    return b"P6\n# wide\n%d %d\n%d\n" % (w, h, maxval) + img16.astype(
        ">u2"
    ).tobytes()


def test_real_decode_ppm_16bit_stdlib():
    """16-bit PPM decodes value-exactly with Pillow ABSENT: high byte
    for the full-range maxval (same §13.12 floor-form reduction as the
    16-bit PNG path), exact integer round-half-up rescale otherwise."""
    rng = np.random.default_rng(37)
    hi = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint16)
    img16 = hi * 256 + rng.integers(0, 256, size=(5, 4, 3))
    assert np.array_equal(
        MM._decode_rgb(ppm16_bytes(img16)), hi.astype(np.uint8)
    )
    # extremes survive: 0 -> 0, 65535 -> 255
    edge = np.array([[[0, 65535, 257]]], dtype=np.uint16)
    assert np.array_equal(
        MM._decode_rgb(ppm16_bytes(edge)),
        np.array([[[0, 255, 1]]], dtype=np.uint8),
    )
    # non-full-range maxval: exact (v*255 + maxval//2) // maxval
    mv = 1023
    img = rng.integers(0, mv + 1, size=(3, 7, 3), dtype=np.uint16)
    want = (
        (img.astype(np.uint32) * 255 + mv // 2) // mv
    ).astype(np.uint8)
    assert np.array_equal(MM._decode_rgb(ppm16_bytes(img, mv)), want)


def test_real_decode_ppm_16bit_through_dataframe(spark):
    """The 16-bit path runs through the Arrow mapInPandas plumbing, not
    just the unit decoder: features match the reduced-depth pixels."""
    rng = np.random.default_rng(41)
    hi = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint16)
    img16 = hi * 256 + rng.integers(0, 256, size=(5, 4, 3))
    df = media_df(spark, [(1, ppm16_bytes(img16), "image")])
    r = MM.decode_images(df, backend="real").collect()[0]
    assert (r.width, r.height, r.n_channels) == (4, 5, 3)
    img8 = hi.astype(np.uint8)
    expect = [float(img8[:, :, c].mean()) / 255.0 for c in range(3)] + [
        float(img8[:, :, c].std()) / 255.0 for c in range(3)
    ]
    assert np.allclose(r.features[:6], expect, atol=1e-6)
