import numpy as np
import pytest

from pdf_toolkit_ray.stages.multimodal import (
    decode_audio,
    decode_image,
    encode_ppm,
    resize_nearest,
    sample_video_frames,
    synthesize_media_table,
)


def test_ppm_roundtrip():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_resize_nearest():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[2:, 2:] = 255
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 0 and small[1, 1, 0] == 255


def test_png_roundtrip_and_filters():
    """From-scratch PNG codec: encode→decode roundtrip, plus a hand-built
    stream exercising every scanline filter type (None/Sub/Up/Avg/Paeth)
    and the grayscale→RGB expansion."""
    import struct
    import zlib

    import numpy as np

    from pdf_toolkit_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(37, 53, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)
    assert np.array_equal(decode_image(encode_png(img)), img)

    h, w, ch = 5, 7, 3
    body = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    raws, prev = [], np.zeros(w * ch, dtype=np.uint8)
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        line = body[y].reshape(-1)
        filt = np.empty(w * ch, dtype=np.uint8)
        for x in range(w * ch):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
            filt[x] = (int(line[x]) - pred) & 0xFF
        raws.append(bytes([ft]) + filt.tobytes())
        prev = line

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), body)

    gray = rng.randint(0, 256, size=(9, 11, 1), dtype=np.uint8)
    raw_g = b"".join(b"\x00" + gray[y].tobytes() for y in range(9))
    png_g = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 11, 9, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw_g))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png_g), np.repeat(gray, 3, axis=2))


def test_wav_stereo_and_widths():
    """Stereo WAV: duration counts FRAMES (not interleaved samples) and
    channels mix down; 24-bit PCM sign-extends correctly."""
    import io
    import wave

    import numpy as np

    rate = 8000
    t = np.arange(rate) / rate
    left = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    right = (np.sin(2 * np.pi * 880 * t) * 10000).astype(np.int16)
    inter = np.empty(2 * rate, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(inter.tobytes())
    samples, r = decode_audio(buf.getvalue())
    assert r == rate and len(samples) == rate  # 1.0 s, not 2.0 s
    want = ((left.astype(np.float64) + right.astype(np.float64)) / 2) / 32768.0
    assert np.allclose(samples, want)

    # 24-bit mono incl. negative values
    vals = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)], dtype=np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(rate)
        wf.writeframes(raw)
    samples, _ = decode_audio(buf.getvalue())
    assert np.allclose(samples, vals.astype(np.float64) / (1 << 23))


def test_png_random_shapes_roundtrip():
    """PNG is lossless: exact roundtrip across random shapes incl. 1x1."""
    import numpy as np

    from pdf_toolkit_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.RandomState(21)
    for h, w in [(1, 1), (1, 17), (33, 1)] + [
        (int(rng.randint(2, 40)), int(rng.randint(2, 40))) for _ in range(10)
    ]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img), (h, w)


def test_jpeg_roundtrip():
    """From-scratch baseline JPEG codec: encode→decode stays close
    (lossy, so PSNR-bounded), exact dims on non-multiple-of-8 images."""
    import numpy as np

    from pdf_toolkit_ray.functions.jpegx import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    h, w = 45, 61
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(yy * 3 + xx * 2) % 256, (255 - xx * 4) % 256, (yy * 5) % 256], axis=2
    ).astype(np.float64)
    img = np.clip(img + rng.normal(0, 4, img.shape), 0, 255).astype(np.uint8)
    out = decode_image(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    mse = float(np.mean((out.astype(np.float64) - img.astype(np.float64)) ** 2))
    assert 10 * np.log10(255**2 / mse) > 28  # PSNR
    # pure noise survives the Huffman tables at lower quality
    noise = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(noise, quality=75)).shape == noise.shape


def test_progressive_jpeg_matches_baseline_exactly():
    """Conformance: the progressive (SOF2) writer and the baseline writer
    share one quantized-coefficient front half, so their decodes must be
    pixel-IDENTICAL — this drives every Annex G scan type (DC first with
    Al=1, DC refine, AC first per spectral band, AC refine) through the
    decoder at several qualities."""
    import numpy as np

    from pdf_toolkit_ray.functions.jpegx import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:37, 0:53]
    img = np.stack([(yy * 4) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=2)
    img[10:20, 10:20] = 250  # hard edge: dense high-frequency AC
    img = np.clip(img + rng.randint(-9, 10, img.shape), 0, 255).astype(np.uint8)
    for q in (90, 50, 25):
        base = decode_jpeg(encode_jpeg(img, q))
        prog = decode_jpeg(encode_jpeg_progressive(img, q))
        assert np.array_equal(base, prog), q
    assert decode_image(encode_jpeg_progressive(img, 90)).shape == img.shape  # routing
    # near-flat image: AC bands are almost all EOB/EOBRUN paths
    flat = np.full((24, 24, 3), 128, dtype=np.uint8)
    flat[0, 0] = 131
    assert np.array_equal(
        decode_jpeg(encode_jpeg(flat, 80)), decode_jpeg(encode_jpeg_progressive(flat, 80))
    )


def test_jpeg_420_subsampling_conformance():
    """The 4:2:0 writers conformance-test the decoder's sampling-factor
    paths (2x2 MCU interleave + chroma upsampling), which no 4:4:4 stream
    reaches. Exactness levers: (1) on gray-content images chroma is
    exactly 128 everywhere, so 4:2:0 and 4:4:4 decodes must be
    pixel-IDENTICAL; (2) baseline and progressive 4:2:0 share quantized
    coefficients, so their decodes must be pixel-identical on ANY image."""
    import numpy as np

    from pdf_toolkit_ray.functions.jpegx import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(5)
    gray = np.repeat(rng.randint(0, 256, (29, 43, 1), dtype=np.uint8), 3, axis=2)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(gray, 85, subsampling="420")),
        decode_jpeg(encode_jpeg(gray, 85)),
    )
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(gray, 85, subsampling="420")),
        decode_jpeg(encode_jpeg_progressive(gray, 85)),
    )
    yy, xx = np.mgrid[0:37, 0:53]
    color = np.stack([(yy * 4) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=2)
    color[10:20, 10:20] = 250
    color = np.clip(color + rng.randint(-9, 10, color.shape), 0, 255).astype(np.uint8)
    for mode in ("422", "420"):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(gray, 85, subsampling=mode)),
            decode_jpeg(encode_jpeg(gray, 85)),
        ), mode
        base = decode_jpeg(encode_jpeg(color, 85, subsampling=mode))
        prog = decode_jpeg(encode_jpeg_progressive(color, 85, subsampling=mode))
        assert np.array_equal(base, prog), mode
        assert base.shape == color.shape
        mse = float(np.mean((base.astype(np.float64) - color.astype(np.float64)) ** 2))
        assert 10 * np.log10(255**2 / mse) > 28, mode  # chroma-lossy but faithful


def test_progressive_ac_refine_zrl_and_eob_paths():
    """Low-level twin check on crafted coefficient blocks that force the
    rare AC-refine paths: a >15 zero-history run before a newly-significant
    coefficient (ZRL + buffered correction bits) and corrections trailing
    the last new coefficient (absorbed by EOB)."""
    import numpy as np

    from pdf_toolkit_ray.functions.jpegx import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        _ac_first_block,
        _ac_refine_block,
        _BitReader,
        _build_decode_table,
        _build_encode_table,
        _encode_ac_first,
        _encode_ac_refine,
    )

    cases = []
    b = np.zeros(64, dtype=np.int64)
    b[1], b[30], b[63] = 5, -1, 1  # 28 zero-history gap -> ZRL, then tail new
    cases.append(b)
    b = np.zeros(64, dtype=np.int64)
    b[2], b[3], b[40] = 1, -7, 3  # corrections trailing the last new coef -> EOB
    cases.append(b)
    b = np.zeros(64, dtype=np.int64)
    b[10] = -1  # single newly-significant, all else zero
    cases.append(b)
    arr = np.zeros((1, len(cases), 64), dtype=np.int64)
    for i, c in enumerate(cases):
        arr[0, i] = c
    enc = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dec = _build_decode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    ss, se = 1, 63
    first = _encode_ac_first(arr, 1, len(cases), enc, ss, se, al=1)
    refine = _encode_ac_refine(arr, 1, len(cases), enc, ss, se, al=0)
    got = np.zeros((len(cases), 64), dtype=np.int64)
    r1 = _BitReader(first, 0)
    eob = 0
    for i in range(len(cases)):
        eob = _ac_first_block(r1, dec, got[i], ss, se, 1, eob)
    r2 = _BitReader(refine, 0)
    eob = 0
    for i in range(len(cases)):
        eob = _ac_refine_block(r2, dec, got[i], ss, se, 0, eob)
    for i, c in enumerate(cases):
        assert np.array_equal(got[i][ss : se + 1], c[ss : se + 1]), i


def test_jpeg_decoder_survives_malformed_input():
    """Truncations and byte flips of a valid stream must terminate with a
    decoded array or a clean exception — never hang or segfault."""
    import struct

    import numpy as np

    from pdf_toolkit_ray.functions.jpegx import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 24, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=80))
    for cut in (3, 20, len(data) // 2, len(data) - 3):
        try:
            decode_jpeg(bytes(data[:cut]))
        except (ValueError, NotImplementedError, struct.error, IndexError, KeyError):
            pass
    for _ in range(30):
        flipped = bytearray(data)
        flipped[rng.randint(2, len(data))] ^= 1 << rng.randint(0, 8)
        try:
            out = decode_jpeg(bytes(flipped))
            assert out.dtype == np.uint8
        except (ValueError, NotImplementedError, struct.error, IndexError, KeyError):
            pass
    # same guarantees for the progressive (multi-scan) stream layout
    from pdf_toolkit_ray.functions.jpegx import encode_jpeg_progressive

    pdata = bytearray(encode_jpeg_progressive(img, quality=80))
    for cut in (3, 40, len(pdata) // 3, len(pdata) // 2, len(pdata) - 3):
        try:
            decode_jpeg(bytes(pdata[:cut]))
        except (ValueError, NotImplementedError, struct.error, IndexError, KeyError):
            pass
    for _ in range(30):
        flipped = bytearray(pdata)
        flipped[rng.randint(2, len(pdata))] ^= 1 << rng.randint(0, 8)
        try:
            out = decode_jpeg(bytes(flipped))
            assert out.dtype == np.uint8
        except (ValueError, NotImplementedError, struct.error, IndexError, KeyError):
            pass


def test_unsupported_formats_raise():
    import struct

    # arithmetic-coded JPEG (SOF9) is declared out of scope (progressive
    # SOF2 is now supported — see test_progressive_jpeg_* )
    sof9 = b"\xff\xd8" + struct.pack(">BBH", 0xFF, 0xC9, 10) + b"\x08\x00\x10\x00\x10\x01\x01\x11"
    with pytest.raises(NotImplementedError):
        decode_image(sof9)
    # ID3-prefixed garbage is now a MALFORMED mp3 (framing parse is real
    # — functions/mp3x.py): ValueError, not a stub hit; a VALID mp3's
    # PCM decode is the honest stub (see tests/test_mp3.py)
    with pytest.raises(ValueError):
        decode_audio(b"ID3 mp3-ish")
    with pytest.raises(NotImplementedError):
        decode_audio(b"OggS ogg-ish")
    # a truncated ftyp is now a MALFORMED mp4 (the container demux is
    # real — functions/mp4x.py), so it's a ValueError, not a stub hit
    with pytest.raises(ValueError):
        sample_video_frames(b"\x00\x00\x00\x18ftypmp42")
    with pytest.raises(NotImplementedError):
        sample_video_frames(b"WEBMNOPE")


def test_fake_video_sampling():
    import struct

    frames = [encode_ppm(np.full((2, 2, 3), i, dtype=np.uint8)) for i in range(25)]
    payload = b"FAKEVID1" + b"".join(struct.pack(">I", len(f)) + f for f in frames)
    picked = sample_video_frames(payload, every_n=10)
    assert len(picked) == 3
    assert decode_image(picked[1])[0, 0, 0] == 10


def test_media_stage_pipeline(ray_session):
    import ray.data

    from pdf_toolkit_ray.stages.multimodal import audio_features, image_features

    tbl = synthesize_media_table(32)
    ds = ray.data.from_arrow(tbl)
    imgs = image_features(ds).to_pandas()
    auds = audio_features(ray.data.from_arrow(tbl)).to_pandas()
    assert len(imgs) == 16 and len(auds) == 16
    assert (imgs["width"] >= 16).all() and (imgs["height"] >= 16).all()
    assert imgs["thumb_digest"].str.len().eq(16).all()
    assert (auds["duration_sec"] == 0.25).all()
    assert ((auds["rms"] > 0.3) & (auds["rms"] < 0.6)).all()  # sine rms ≈ 0.43
    # determinism
    imgs2 = image_features(ray.data.from_arrow(synthesize_media_table(32))).to_pandas()
    assert imgs.sort_values("media_id").reset_index(drop=True).equals(
        imgs2.sort_values("media_id").reset_index(drop=True)
    )


def test_jpeg_dqt_is_annex_k_in_zigzag_order():
    """ADVICE regression: the DQT segment must carry the quality-scaled
    Annex K table in ZIGZAG byte order (T.81 B.2.4.1) — previously the
    natural-order listing was written, so the effective quantization
    matrix was a permutation of Annex K."""
    import numpy as np

    from pdf_toolkit_ray.functions.jpegx import (
        QT_LUMA, ZIGZAG, _quality_scale, encode_jpeg,
    )

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=90)
    # find first DQT (FF DB), skip len(2)+tq(1), read 64 bytes
    i = data.index(b"\xff\xdb")
    tbl = np.frombuffer(data[i + 5 : i + 5 + 64], dtype=np.uint8).astype(np.int32)
    natural = np.empty(64, dtype=np.int32)
    natural[ZIGZAG] = tbl  # de-zigzag
    assert np.array_equal(natural, _quality_scale(QT_LUMA, 90))


def test_multimodal_digest_pins_and_sensitivity(ray_session):
    """The driver-hashable digest companions: (a) match the constants
    pinned in their SQL twins (any decoder/feature change must flip them
    AND be re-pinned deliberately); (b) a single-pixel payload change
    flips the image digest — the hash actually covers decoded content."""
    import ray.data

    from pdf_toolkit_ray.queries import (
        multimodal_audio_digest,
        multimodal_image_digest,
        multimodal_video_digest,
    )
    from pdf_toolkit_ray.stages.multimodal import (
        image_features,
        synthesize_media_table,
    )
    from pdf_toolkit_ray.queries import _feature_digest, _hex_digest_sum

    img = multimodal_image_digest("unused").to_pydict()
    assert img == {
        "n_images": [32], "sum_width": [1280], "sum_height": [1188],
        "sum_mean_milli": [12217858],
        "thumb_digest_sum": [1185982483987052357],
    }
    aud = multimodal_audio_digest("unused").to_pydict()
    assert aud == {
        "n_clips": [32], "sum_duration_us": [8000000],
        "sum_rms_micro": [13808732], "sum_peak_micro": [19500984],
    }
    vid = multimodal_video_digest("unused").to_pydict()
    assert vid == {
        "n_frames": [78], "sum_frame_idx": [314], "sum_width": [1246],
        "sum_height": [1152], "frame_digest_sum": [2727670674655006719],
    }

    # sensitivity: flip one raster byte of one PPM payload -> digest moves
    tbl = synthesize_media_table(64).to_pydict()
    for i, (kind, payload) in enumerate(zip(tbl["kind"], tbl["payload"])):
        if kind == "image" and payload[:2] == b"P6":
            b = bytearray(payload)
            # pixel (0,0) is always sampled by the 8x8 nearest thumbnail
            b[payload.index(b"255\n") + 4] ^= 0x40
            tbl["payload"][i] = bytes(b)
            break
    else:
        raise AssertionError("no PPM image in fixture")
    import pyarrow as pa

    mutated = _feature_digest(
        image_features(ray.data.from_arrow(pa.table(tbl))),
        {"thumb_digest_sum": lambda b: _hex_digest_sum(b.column("thumb_digest"))},
    ).to_pydict()
    assert mutated["thumb_digest_sum"] != [1185982483987052357]


def test_audio_spectral_analytic_sines(ray_session):
    """Pure sines pin the DSP analytically: centroid/rolloff ≈ f,
    zcr ≈ 2f/rate; a full-rate FLAC clip goes through the same stage."""
    import io
    import wave

    import pyarrow as pa
    import ray.data

    from pdf_toolkit_ray.functions.flacx import encode_flac
    from pdf_toolkit_ray.stages.multimodal import audio_spectral

    rate = 8000
    rows = []
    for mid, f in enumerate([250.0, 1000.0, 2000.0]):
        t = np.arange(rate) / rate  # 1 second → 1 Hz bins
        samples = (np.sin(2 * np.pi * f * t) * 20000).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(samples.tobytes())
        rows.append((mid, buf.getvalue()))
    # same 1 kHz tone as FLAC: the real codec feeds the same DSP
    t = np.arange(rate) / rate
    rows.append(
        (3, encode_flac((np.sin(2 * np.pi * 1000.0 * t) * 20000).astype(np.int32), rate))
    )
    tbl = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array(["audio"] * len(rows)),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )
    out = (
        audio_spectral(ray.data.from_arrow(tbl))
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    for i, f in enumerate([250.0, 1000.0, 2000.0, 1000.0]):
        assert abs(out.loc[i, "centroid_hz"] - f) < f * 0.02 + 5
        assert abs(out.loc[i, "rolloff_hz"] - f) < f * 0.02 + 5
        assert abs(out.loc[i, "zcr"] - 2 * f / 8000) < 0.01
    # WAV and FLAC of the same tone must agree closely
    assert abs(out.loc[1, "centroid_hz"] - out.loc[3, "centroid_hz"]) < 1.0
    assert abs(out.loc[1, "zcr"] - out.loc[3, "zcr"]) < 1e-6


def test_png_adam7_pass_matrix_matches_spec():
    """The Adam7 grid itself, pinned against the PNG spec's 8x8 pattern —
    guards against a mutual encoder/decoder transposition."""
    import numpy as np

    from pdf_toolkit_ray.stages.multimodal import _ADAM7

    spec = np.array(
        [
            [1, 6, 4, 6, 2, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [3, 6, 4, 6, 3, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
        ]
    )
    got = np.zeros((8, 8), dtype=int)
    for k, (x0, y0, dx, dy) in enumerate(_ADAM7, start=1):
        got[y0::dy, x0::dx] = k  # later passes never overwrite earlier cells
    assert np.array_equal(got, spec)


def test_png_interlaced_and_palette_roundtrips():
    """Adam7 + palette paths: encoder-twin roundtrips across shapes that
    produce empty passes, single-pixel passes and packed sub-byte rows."""
    import numpy as np

    from pdf_toolkit_ray.stages.multimodal import (
        decode_png,
        encode_png,
        encode_png_interlaced,
        encode_png_palette,
    )

    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (2, 3), (7, 5), (16, 16), (33, 21), (64, 1), (1, 64)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png_interlaced(img)), img), (h, w)
        # interlaced and sequential encodings of the same image decode equal
        assert np.array_equal(
            decode_png(encode_png_interlaced(img)), decode_png(encode_png(img))
        )
    for depth in (1, 2, 4, 8):
        ncol = 2 ** depth
        pal = rng.randint(0, 256, size=(ncol, 3), dtype=np.uint8)
        for h, w in [(1, 1), (3, 7), (13, 11), (9, 16)]:
            idx = rng.randint(0, ncol, size=(h, w)).astype(np.uint8)
            exp = pal[idx]
            assert np.array_equal(
                decode_png(encode_png_palette(idx, pal, depth)), exp
            ), (depth, h, w)
            assert np.array_equal(
                decode_png(encode_png_palette(idx, pal, depth, interlace=True)), exp
            ), (depth, h, w, "interlaced")


def test_png_interlaced_truncation_raises():
    """Truncated interlaced streams fail loudly, never return garbage."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from pdf_toolkit_ray.stages.multimodal import (
        _png_chunk,
        decode_png,
        encode_png_interlaced,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    full = encode_png_interlaced(img)
    assert np.array_equal(decode_png(full), img)

    # rebuild with the inflated payload cut mid-pass
    raw_parts = []
    off = 8
    while off + 8 <= len(full):
        (ln,) = struct.unpack_from(">I", full, off)
        ctype = full[off + 4 : off + 8]
        data = full[off + 8 : off + 8 + ln]
        off += 12 + ln
        if ctype == b"IDAT":
            raw_parts.append(data)
    raw = zlib.decompress(b"".join(raw_parts))
    cut = zlib.compress(raw[: len(raw) // 2])
    broken = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 16, 8, 2, 0, 0, 1))
        + _png_chunk(b"IDAT", cut)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(broken)
