"""Round-14 operators: failure-tolerant media kernels (verdict r13 #1),
per-modality near-dup inside curate_media (verdict r13 #4), and the
fingerprint front-door guards (ADVICE r13).

The planted undecodable blobs are all PROBE-VALID (header parses, so the
header-only gates keep them) but CODEC-UNSUPPORTED (the decoders raise):
truncated-IDAT PNG, arithmetic-coded (SOF9) JPEG, ADPCM WAV, an AVI
whose frame payload is not JPEG — exactly the blob classes a real web
corpus guarantees to contain.  The contract under test: the job
COMPLETES, such rows pass through dedup as non-candidates, and the
report counts them."""

from __future__ import annotations

import zlib

import numpy as np
import pytest


def _palette_png(w: int = 16, h: int = 16) -> bytes:
    """A real palette (color-type 3) PNG — 16 RGB entries, row i filled
    with index i%16 (decodable as of round 14; media_probe reads its
    IHDR dims)."""
    from adampro_spark.pipeline.multimodal import _PNG_MAGIC, _png_chunk

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    plte = bytes(x % 256 for x in range(48))  # 16 RGB entries
    raw = b"".join(b"\x00" + bytes([i % 16] * w) for i in range(h))
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _truncated_png(w: int = 16, h: int = 16) -> bytes:
    """A PNG whose IDAT is cut mid-stream: media_probe reads its IHDR
    dims (probe-valid), decode_png raises on the truncated inflate —
    the corrupt-download blob class every crawl contains.  (Round 15
    note: this replaced the 4-bit-depth fixture here, which DECODES
    now — sub-byte coverage lives in test_round15_ops.)"""
    from adampro_spark.pipeline.multimodal import _PNG_MAGIC, _png_chunk

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    raw = b"".join(b"\x00" + bytes([0x55] * w) for i in range(h))
    z = zlib.compress(raw)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", z[: len(z) // 2])
        + _png_chunk(b"IEND", b"")
    )


def _sof9_jpeg(img: np.ndarray) -> bytes:
    """An arithmetic-coded-marker JPEG: encode baseline, then flip the
    SOF0 marker to SOF9 — media_probe still reads dims (SOF9 is in its
    SOF list); decode_jpeg raises NotImplementedError."""
    from adampro_spark.pipeline.multimodal import encode_jpeg

    blob = encode_jpeg(img, quant=2)
    i = blob.find(b"\xff\xc0")
    assert i > 0
    return blob[:i] + b"\xff\xc9" + blob[i + 2:]


def _nonpcm_wav(n_samples: int = 200) -> bytes:
    """A RIFF/WAVE stream with fmt codec id 2 (ADPCM): media_probe
    reports format wav with n_frames ≥ the envelope grid; decode_wav
    raises NotImplementedError."""
    from adampro_spark.pipeline.multimodal import _riff_chunk

    fmt = (
        (2).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + (16_000).to_bytes(4, "little")
        + (32_000).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + _riff_chunk(b"fmt ", fmt)
        + _riff_chunk(b"data", b"\x00" * (2 * n_samples))
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _junk_frame_avi(frame: np.ndarray) -> bytes:
    """A structurally-valid MJPEG-AVI whose frame payload is NOT a JPEG:
    probe/avi_frame_count work (container walk), decode_avi_frames
    raises on the frame."""
    from adampro_spark.pipeline.multimodal import encode_avi_mjpeg

    blob = encode_avi_mjpeg([frame])
    i = blob.find(b"\xff\xd8", blob.find(b"movi"))
    assert i > 0
    return blob[:i] + b"\x00\x00" + blob[i + 2:]


def test_curate_media_undecodable_tolerance_and_modalities(spark):
    """The flagship corpus-grade contract (verdict r13 #1 + #4): a mixed
    image/audio/video corpus containing probe-valid-but-undecodable
    blobs curates to completion; near-dup runs PER MODALITY (retouched
    image, transient-click audio copy, re-encoded video copy all drop;
    originals survive); undecodables pass through, counted."""
    from adampro_spark.pipeline.multimodal import (
        curate_media,
        encode_avi_mjpeg,
        encode_bmp,
        encode_wav,
    )

    h, w = 36, 32
    ramp = (np.add.outer(np.arange(h) * 7, np.arange(w) * 3) % 256).astype(
        np.uint8
    )
    retouched = np.clip(
        ramp.astype(np.int16)
        + np.pad(np.full((3, 3), 9, dtype=np.int16), ((5, h - 8), (5, w - 8))),
        0,
        255,
    ).astype(np.uint8)

    rng = np.random.RandomState(7)
    base_audio = (rng.standard_normal(6400) * 8000).astype(np.int16)
    clicked = base_audio.copy()
    clicked[100:103] += 500  # a transient click, envelope barely moves

    frames = [ramp, (255 - ramp).astype(np.uint8)]

    rows = [
        (0, encode_bmp(ramp)),                      # image keeper
        (1, encode_bmp(retouched)),                 # image near-dup -> drop
        (2, _truncated_png()),                      # undecodable image
        (3, _sof9_jpeg(ramp)),                      # undecodable image
        (4, _nonpcm_wav()),                         # undecodable audio
        (5, encode_wav(base_audio)),                # audio keeper
        (6, encode_wav(clicked)),                   # audio near-dup -> drop
        (7, encode_avi_mjpeg(frames, quant=1)),     # video keeper
        (8, encode_avi_mjpeg(frames, quant=2)),     # re-encode -> drop
        (9, _junk_frame_avi(ramp)),                 # undecodable video
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out, report = curate_media(df)
    kept = {r["media_id"] for r in out.collect()}

    # undecodables pass through (never crash, never dedup); one of each
    # modality's near-dup family drops
    assert kept == {0, 2, 3, 4, 5, 7, 9}
    assert report["n_input"] == 10
    assert report["n_bad_format"] == 0
    assert report["n_after_gates"] == 10
    assert report["n_exact_dropped"] == 0
    assert report["n_undecodable"] == 4
    assert report["n_neardup_dropped_image"] == 1
    assert report["n_neardup_dropped_audio"] == 1
    assert report["n_neardup_dropped_video"] == 1
    assert report["n_neardup_dropped"] == 3
    assert report["n_output"] == 7


def test_curate_media_against_continuous_ingestion(spark):
    """The continuous-ingestion composition (verdict r13 #6): a NEW
    batch curates against an existing curated corpus — byte copies drop
    at the sha gate, re-encodes/retouches drop per modality via
    fingerprint_against, genuinely new material and undecodables
    survive, and the new batch is never self-deduplicated."""
    from adampro_spark.pipeline.multimodal import (
        curate_media_against,
        encode_avi_mjpeg,
        encode_bmp,
        encode_jpeg,
        encode_wav,
    )

    h, w = 36, 32
    ramp = (np.add.outer(np.arange(h) * 7, np.arange(w) * 3) % 256).astype(
        np.uint8
    )
    rng = np.random.RandomState(9)
    ref_audio = (rng.standard_normal(6400) * 8000).astype(np.int16)
    clicked = ref_audio.copy()
    clicked[200:203] += 400
    frames = [ramp, (255 - ramp).astype(np.uint8)]

    ref = spark.createDataFrame(
        [
            (100, encode_bmp(ramp)),
            (101, encode_wav(ref_audio)),
            (102, encode_avi_mjpeg(frames, quant=1)),
        ],
        "media_id long, content binary",
    )
    fresh = (ramp.T % 256).astype(np.uint8)  # different material
    new = spark.createDataFrame(
        [
            (0, encode_bmp(ramp)),               # byte copy -> exact drop
            (1, encode_jpeg(ramp, quant=2)),     # re-encode -> image drop
            (2, encode_wav(clicked)),            # click copy -> audio drop
            (3, encode_avi_mjpeg(frames, quant=2)),  # re-encode -> video drop
            (4, encode_bmp(fresh)),              # new material -> keep
            (5, encode_bmp(fresh)),              # intra-batch dup: KEPT
            (6, _sof9_jpeg(ramp)),               # undecodable -> keep
        ],
        "media_id long, content binary",
    )
    out, rep = curate_media_against(new, ref)
    kept = {r["media_id"] for r in out.collect()}
    assert kept == {4, 5, 6}
    assert rep["n_exact_vs_ref"] == 1
    assert rep["n_neardup_vs_ref_image"] == 1
    assert rep["n_neardup_vs_ref_audio"] == 1
    assert rep["n_neardup_vs_ref_video"] == 1
    assert rep["n_neardup_vs_ref"] == 3
    assert rep["n_undecodable"] == 1
    assert rep["n_output"] == 3
    assert out.columns == ["media_id", "content"]

    # exact-only mode: just the sha gate
    out2, rep2 = curate_media_against(new, ref, dedup="exact")
    assert {r["media_id"] for r in out2.collect()} == {1, 2, 3, 4, 5, 6}
    assert rep2["n_exact_vs_ref"] == 1 and rep2["n_neardup_vs_ref"] == 0


def test_curate_media_empty_input(spark):
    """ADVICE r13: F.sum over zero rows is NULL — an empty corpus must
    report zeros, not TypeError."""
    from adampro_spark.pipeline.multimodal import curate_media

    df = spark.createDataFrame([], "media_id long, content binary")
    out, report = curate_media(df)
    assert out.count() == 0
    assert report["n_input"] == 0
    assert report["n_output"] == 0
    assert report["n_undecodable"] == 0


def test_curate_media_grid_too_small_passes_through(spark):
    """An image under the 9×8 dhash grid (but over the user's size
    floor) is never decoded for hashing: it passes through, not counted
    undecodable (the probed-dims eligibility route, ADVICE r13)."""
    from adampro_spark.pipeline.multimodal import curate_media, encode_bmp

    small = np.full((6, 6), 50, dtype=np.uint8)
    big = (np.add.outer(np.arange(16) * 5, np.arange(16) * 11) % 256).astype(
        np.uint8
    )
    df = spark.createDataFrame(
        [(0, encode_bmp(small)), (1, encode_bmp(small)), (2, encode_bmp(big))],
        "media_id long, content binary",
    )
    out, report = curate_media(df)
    # the two small copies differ only... they ARE byte-identical: exact
    # dedup still catches them (cheap sha, no decode)
    assert {r["media_id"] for r in out.collect()} == {0, 2}
    assert report["n_exact_dropped"] == 1
    assert report["n_undecodable"] == 0
    assert report["n_neardup_dropped"] == 0


def test_image_dhash_null_on_undecodable(spark):
    """The tolerant kernel contract: undecodable blobs hash to NULL,
    decodable neighbours in the same Arrow batch still hash."""
    from adampro_spark.pipeline.multimodal import encode_bmp, image_dhash

    img = (np.add.outer(np.arange(12) * 3, np.arange(12) * 5) % 256).astype(
        np.uint8
    )
    df = spark.createDataFrame(
        [(0, encode_bmp(img)), (1, _truncated_png()), (2, b"not media")],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got[0] is not None and got[0] >= 0
    assert got[1] is None
    assert got[2] is None


def test_video_fingerprint_null_on_undecodable(spark):
    from adampro_spark.pipeline.multimodal import (
        encode_avi_mjpeg,
        video_fingerprint,
    )

    frame = np.full((16, 16), 100, dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, encode_avi_mjpeg([frame])), (1, _junk_frame_avi(frame))],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r for r in video_fingerprint(df).collect()}
    assert got[0]["n_frames"] == 1 and got[0]["px_sum"] == 16 * 16 * 100
    assert got[1]["px_sum"] is None and got[1]["n_sampled"] is None


def test_extract_features_null_on_undecodable(spark):
    from adampro_spark.pipeline.multimodal import (
        decode_media,
        encode_bmp,
        extract_features,
    )

    img = np.full((10, 10), 80, dtype=np.uint8)
    meta = {
        "format": "bmp", "width": 10, "height": 10,
        "n_frames": 1, "sample_rate": None,
    }
    from adampro_spark.pipeline.multimodal import media_schema

    df = spark.createDataFrame(
        [(0, encode_bmp(img), meta), (1, b"\x89PNG\r\n\x1a\njunk", meta)],
        media_schema(),
    )
    got = {
        r["media_id"]: r["feature"]
        for r in extract_features(df, out_dim=4, decoder=decode_media).collect()
    }
    assert got[0] is not None and len(got[0]) == 4
    assert got[1] is None


# ---------------------------------------------------------------------------
# Progressive (SOF2) JPEG decode (verdict r13 #2)
# ---------------------------------------------------------------------------

_JFIX = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "resources", "jpeg"
)


def _jfix(name):
    import os

    with open(os.path.join(_JFIX, name), "rb") as f:
        return f.read()


def _prog_truth(key):
    import os

    return np.load(os.path.join(_JFIX, "imageio_prog_truth.npz"))[key]


def test_jpeg_progressive_external_encoder_interop():
    """The JDK ImageIO progressive fixtures (MODE_DEFAULT — the IJG
    jpeg_simple_progression script: spectral selection + DC and AC
    successive approximation, 6 scans gray / 10 scans 4:2:0 color)
    must decode within ±2 of the independent ImageIO truth, on both
    the luma-only and full-RGB paths."""
    from adampro_spark.pipeline.multimodal import decode_jpeg, media_probe

    gray = _jfix("prog_gray.jpg")
    assert b"\xff\xc2" in gray  # really SOF2
    out = decode_jpeg(gray)
    want = _prog_truth("prog_gray")
    assert out.shape == want.shape
    assert int(np.abs(out.astype(int) - want.astype(int)).max()) <= 2

    color = _jfix("prog_color.jpg")
    assert b"\xff\xc2" in color and color.count(b"\xff\xda") >= 8
    outc = decode_jpeg(color, rgb=True)
    wantc = _prog_truth("prog_color")
    assert outc.shape == wantc.shape
    assert int(np.abs(outc.astype(int) - wantc.astype(int)).max()) <= 2
    # luma-only decode skips the chroma AC scans and must still agree
    # with the truth's BT.601 luma within the same band
    luma = decode_jpeg(color)
    ytruth = (
        0.299 * wantc[..., 0] + 0.587 * wantc[..., 1] + 0.114 * wantc[..., 2]
    )
    assert int(np.abs(luma.astype(float) - ytruth).max()) <= 3
    # the probe reads progressive dims header-only
    p = media_probe(color)
    assert (p["format"], p["width"], p["height"]) == ("jpeg", 16, 16)


def test_jpeg_progressive_roundtrip_matches_baseline():
    """encode_jpeg_progressive → decode_jpeg must produce EXACTLY the
    baseline pair's pixels (identical coefficients, shared IDCT tail)
    across gray/RGB/4:2:0, successive-approximation DC depths, spectral
    splits, and the no-split single-band shape."""
    from adampro_spark.pipeline.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(5)
    ramp = (np.add.outer(np.arange(21) * 7, np.arange(19) * 3) % 256).astype(
        np.uint8
    )
    noisy = rng.randint(0, 256, (16, 18)).astype(np.uint8)
    rgb = np.dstack([ramp, 255 - ramp, ramp // 2])

    for im, ekw, dkw in [
        (ramp, {}, {}),
        (noisy, {"dc_al": 3}, {}),
        (noisy, {"ac_split": 63, "dc_al": 0}, {}),
        (ramp, {"quant": 4}, {}),
        (rgb, {}, {"rgb": True}),
        (rgb, {"quant": 2, "subsample": True}, {"rgb": True}),
    ]:
        prog = decode_jpeg(encode_jpeg_progressive(im, **ekw), **dkw)
        base = decode_jpeg(
            encode_jpeg(
                im,
                quant=ekw.get("quant"),
                subsample=ekw.get("subsample", False),
            ),
            **dkw,
        )
        assert prog.shape == base.shape
        assert int(np.abs(prog.astype(int) - base.astype(int)).max()) == 0


def test_jpeg_progressive_dhash_pairs_with_baseline(spark):
    """The near-dup contract the progressive decoder exists for: a
    progressive re-encode of a baseline image fingerprint-pairs with
    its original at tight hamming (verdict r13 #2 'Done' criterion)."""
    from adampro_spark.pipeline.dedup import fingerprint_pairs
    from adampro_spark.pipeline.multimodal import (
        decode_jpeg,
        encode_jpeg_progressive,
        image_dhash,
    )

    orig = _jfix("grad.jpg")
    reenc = encode_jpeg_progressive(decode_jpeg(orig), quant=2)
    df = spark.createDataFrame(
        [(1, orig), (2, reenc)], "media_id long, content binary"
    )
    pairs = fingerprint_pairs(
        image_dhash(df), "dhash", pk="media_id", max_hamming=6, nbits=63
    ).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] <= 6


# ---------------------------------------------------------------------------
# Round-14 codec widening: palette/16-bit PNG, 8/24/32-bit + float WAV
# ---------------------------------------------------------------------------


def test_png_palette_decode():
    """Color-type-3 PNG: PLTE lookup gives truecolor semantics — the
    rgb path returns palette entries verbatim, the luma path applies the
    same BT.601 integer formula as truecolor."""
    from adampro_spark.pipeline.multimodal import decode_png

    blob = _palette_png()
    rgb = decode_png(blob, rgb=True)
    plte = np.array([(x * 3 % 256, (x * 3 + 1) % 256, (x * 3 + 2) % 256)
                     for x in range(16)], dtype=np.uint8)
    # row i is palette entry i%16; our palette bytes are 0..47 in order
    want = np.arange(48, dtype=np.uint8).reshape(16, 3)
    for i in range(16):
        assert (rgb[i] == want[i % 16]).all(), i
    luma = decode_png(blob)
    r, g, b = (want[:, c].astype(np.uint32) for c in range(3))
    lrow = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    for i in range(16):
        assert (luma[i] == lrow[i % 16]).all(), i
    del plte


def test_png_16bit_decode_high_byte_and_filter_distance():
    """16-bit grayscale PNG: samples reduce to their high byte, and the
    Sub/Paeth filter distance is the PIXEL byte width (2), not the
    channel count — a Sub-filtered row decodes exactly."""
    import zlib as _z

    from adampro_spark.pipeline.multimodal import (
        _PNG_MAGIC,
        _png_chunk,
        decode_png,
    )

    h, w = 4, 6
    vals = (np.add.outer(np.arange(h) * 1000, np.arange(w) * 257) % 65536).astype(
        np.uint16
    )
    rows = []
    for y in range(h):
        be = vals[y].astype(">u2").tobytes()
        if y % 2 == 0:
            rows.append(b"\x00" + be)  # filter None
        else:
            # filter Sub over 2-byte lanes
            raw = np.frombuffer(be, dtype=np.uint8).astype(np.int32)
            sub = raw.copy()
            sub[2:] = (raw[2:] - raw[:-2]) % 256
            rows.append(b"\x01" + sub.astype(np.uint8).tobytes())
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([16, 0, 0, 0, 0])
    blob = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    assert (out == (vals >> 8).astype(np.uint8)).all()


def _wav_blob(fmt: int, bits: int, payload: bytes, nch: int = 1) -> bytes:
    from adampro_spark.pipeline.multimodal import _riff_chunk

    block = max(nch * (bits // 8), 1)
    fmtc = (
        fmt.to_bytes(2, "little")
        + nch.to_bytes(2, "little")
        + (16_000).to_bytes(4, "little")
        + (16_000 * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + _riff_chunk(b"fmt ", fmtc) + _riff_chunk(b"data", payload)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_wav_variants_normalize_to_int16():
    """8/24/32-bit PCM and 32-bit IEEE float all decode to the int16
    contract with the exact documented reductions."""
    from adampro_spark.pipeline.multimodal import decode_wav

    # 8-bit unsigned: (v - 128) << 8
    u8 = np.array([0, 128, 255, 64], dtype=np.uint8)
    s, rate = decode_wav(_wav_blob(1, 8, u8.tobytes()))
    assert rate == 16_000
    assert s.tolist() == [((int(v) - 128) << 8) for v in u8]

    # 24-bit: high two bytes (arithmetic >> 8 after sign-extension)
    vals24 = [0x000100, 0x7FFFFF, -0x800000, -0x000100]
    b24 = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals24
    )
    s, _ = decode_wav(_wav_blob(1, 24, b24))
    assert s.tolist() == [v >> 8 for v in vals24]

    # 32-bit int: >> 16
    vals32 = np.array([1 << 16, -(1 << 16), 0x7FFF0000, -0x80000000], dtype=np.int32)
    s, _ = decode_wav(_wav_blob(1, 32, vals32.astype("<i4").tobytes()))
    assert s.tolist() == [int(v) >> 16 for v in vals32]

    # IEEE float: clip to [-1, 1] * 32767 (round-half-even is fine: the
    # planted values land exactly)
    f = np.array([0.0, 1.0, -1.0, 2.0, -3.0, 0.5], dtype=np.float32)
    s, _ = decode_wav(_wav_blob(3, 32, f.tobytes()))
    assert s.tolist() == [0, 32767, -32767, 32767, -32767, 16384]

    # stereo float folds to channel 0 in decode_media/audio kernels;
    # here just check the (n, 2) shape survives
    st = np.array([0.1, -0.1, 0.2, -0.2], dtype=np.float32)
    s, _ = decode_wav(_wav_blob(3, 32, st.tobytes(), nch=2))
    assert s.shape == (2, 2)


def test_png_adam7_external_encoder_interop():
    """Adam7-interlaced PNGs encoded by JDK ImageIO (progressive mode)
    decode EXACTLY (PNG is lossless): 17×17 dims make every pass
    ragged, so the pass-grid arithmetic and per-pass filtering are both
    pinned against an independent encoder's bytes."""
    import os

    from adampro_spark.pipeline.multimodal import decode_png

    fixdir = os.path.join(os.path.dirname(__file__), "resources", "png")
    gray = open(os.path.join(fixdir, "adam7_gray.png"), "rb").read()
    assert gray[28] == 1  # IHDR interlace byte
    truth = np.load(os.path.join(fixdir, "adam7_truth.npz"))["gray"]
    assert (decode_png(gray) == truth).all()

    color = open(os.path.join(fixdir, "adam7_color.png"), "rb").read()
    assert color[28] == 1
    n = 17
    want = np.zeros((n, n, 3), dtype=np.uint8)
    for y in range(n):
        for x in range(n):
            want[y, x] = ((x * 11) % 256, (y * 17) % 256, (x * 3 + y * 5) % 256)
    assert (decode_png(color, rgb=True) == want).all()


def test_wav_g711_expansion_tables():
    """µ-law/A-law decode through the exact ITU expansion: spot values
    from the G.711 tables, and a µ-law re-encode of a sine hashes like
    its linear original through the envelope fingerprint."""
    from adampro_spark.pipeline.multimodal import (
        _alaw_table,
        _mulaw_table,
        audio_envelope_bits,
        decode_wav,
    )

    mu = _mulaw_table()
    assert mu[0xFF] == 0          # quiet point (positive zero)
    assert mu[0x7F] == 0          # negative zero folds to 0
    assert mu[0x80] == 32124      # max POSITIVE magnitude (bytes with
    assert mu[0x00] == -32124     # bit 7 set are the positive half)
    al = _alaw_table()
    assert al[0x55] == -8 and al[0xD5] == 8  # the A-law zero pair
    assert int(np.abs(al).max()) == 32256    # A-law full scale

    # container: µ-law WAV decodes via the table
    t = np.arange(6400)
    lin = (np.sin(t / 40.0) * 12000).astype(np.int16)
    # companding round-trip: encode linear -> µ-law byte via nearest
    # table entry (test-side only; the engine only DECODES G.711)
    order = np.argsort(mu)
    idx = np.clip(np.searchsorted(mu[order], lin), 0, 255)
    mu_bytes = order[idx].astype(np.uint8)
    blob = _wav_blob(7, 8, mu_bytes.tobytes())
    dec, rate = decode_wav(blob)
    assert rate == 16_000
    # companded quantization error is bounded by the top-segment step
    assert int(np.abs(dec.astype(np.int32) - lin).max()) <= 1024
    # and the loudness envelope survives companding bit-for-bit-ish
    h_lin = audio_envelope_bits(lin)
    h_mu = audio_envelope_bits(dec)
    assert bin(h_lin ^ h_mu).count("1") <= 4


def test_gif_external_encoder_interop():
    """GIF fixtures encoded by JDK ImageIO (identity-gray indexed
    palette, so GIF is lossless) decode EXACTLY: sequential, the 4-pass
    GIF interlace, and an animated stream (frame 1 + probed frame
    count); media_probe reads dims/frames by sub-block striding."""
    import os

    from adampro_spark.pipeline.multimodal import decode_gif, media_probe

    fixdir = os.path.join(os.path.dirname(__file__), "resources", "gif")
    w, h = 19, 15
    want = (
        (np.arange(w)[None, :] * 13 + np.arange(h)[:, None] * 29) % 256
    ).astype(np.uint8)
    for name, frames in (("plain", 1), ("inter", 1), ("anim", 3)):
        blob = open(os.path.join(fixdir, f"{name}.gif"), "rb").read()
        p = media_probe(blob)
        assert (p["format"], p["width"], p["height"], p["n_frames"]) == (
            "gif", w, h, frames,
        ), name
        assert (decode_gif(blob) == want).all(), name
        assert (decode_gif(blob, rgb=True) == want[:, :, None]).all(), name


def test_gif_rides_curate_media(spark):
    """GIF is a first-class image modality: a GIF re-encode of a BMP
    near-dups with it; junk-tailed GIF bytes hash to NULL and pass
    through (the failure-tolerance contract)."""
    import os

    from adampro_spark.pipeline.multimodal import curate_media, decode_gif, encode_bmp

    fixdir = os.path.join(os.path.dirname(__file__), "resources", "gif")
    gif = open(os.path.join(fixdir, "plain.gif"), "rb").read()
    bmp_twin = encode_bmp(decode_gif(gif))
    # a GIF whose LZW data is truncated mid-image: probe-valid, decode
    # raises -> NULL hash -> passes through
    cut = gif[: len(gif) - 40]
    df = spark.createDataFrame(
        [(0, bmp_twin), (1, gif), (2, cut)],
        "media_id long, content binary",
    )
    out, rep = curate_media(df)
    kept = {r["media_id"] for r in out.collect()}
    assert kept == {0, 2}
    assert rep["n_neardup_dropped_image"] == 1
    assert rep["n_undecodable"] == 1


def test_wav_ima_adpcm_hand_vector_and_roundtrip():
    """IMA ADPCM (WAV format 0x11): an exact HAND-COMPUTED vector pins
    the predictor recurrence (steps, index walk, clamps), the probe's
    n_frames matches the decoded length exactly, and an encode→decode
    round trip of a sine keeps SNR high and the envelope hash close."""
    from adampro_spark.pipeline.multimodal import (
        _IMA_INDEX,
        _IMA_STEPS,
        audio_envelope_bits,
        decode_wav,
        media_probe,
    )

    # one 8-byte block: pred=100, index=4, bytes 0x10 0x82 0x37 0xF9
    block = (100).to_bytes(2, "little", signed=True) + bytes(
        [4, 0, 0x10, 0x82, 0x37, 0xF9]
    )
    blob = _wav_blob(0x11, 4, block)
    # _wav_blob writes block_align = nch*(bits//8) = 0; patch it to 8
    i = blob.find(b"fmt ")
    blob = blob[: i + 8 + 12] + (8).to_bytes(2, "little") + blob[i + 8 + 14:]
    dec, rate = decode_wav(blob)
    # hand-derived: s0=100 then nibbles 0,1,2,8,7,3,9,F through the
    # published step/index tables starting at index 4
    assert dec.tolist() == [100, 101, 104, 109, 108, 119, 133, 129, 106]
    assert media_probe(blob)["n_frames"] == len(dec)

    # property round trip with a test-local reference encoder
    def ima_encode(samples, ba=256):
        out = bytearray()
        i = 0
        n = len(samples)
        while i < n:
            pred = int(samples[i])
            index = 0
            out += pred.to_bytes(2, "little", signed=True) + bytes([index, 0])
            i += 1
            nibs = []
            for _ in range(2 * (ba - 4)):
                target = int(samples[i]) if i < n else pred
                step = int(_IMA_STEPS[index])
                delta = target - pred
                nib = 8 if delta < 0 else 0
                delta = abs(delta)
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                diff = step >> 3
                if nib & 4:
                    diff += step
                if nib & 2:
                    diff += step >> 1
                if nib & 1:
                    diff += step >> 2
                pred = pred - diff if nib & 8 else pred + diff
                pred = min(max(pred, -32768), 32767)
                index = min(max(index + int(_IMA_INDEX[nib & 7]), 0), 88)
                nibs.append(nib)
                if i < n:
                    i += 1
            for lo, hi in zip(nibs[0::2], nibs[1::2]):
                out.append(lo | (hi << 4))
        return bytes(out)

    t = np.arange(6400)
    sig = (np.sin(t / 30.0) * 9000).astype(np.int16)
    ba = 256
    enc = ima_encode(sig, ba)
    blob2 = _wav_blob(0x11, 4, enc)
    i = blob2.find(b"fmt ")
    blob2 = (
        blob2[: i + 8 + 12] + ba.to_bytes(2, "little") + blob2[i + 8 + 14:]
    )
    dec2, _ = decode_wav(blob2)
    dec2 = dec2[: len(sig)]
    err = dec2.astype(np.float64) - sig.astype(np.float64)
    snr = 10 * np.log10((sig.astype(np.float64) ** 2).mean() / (err**2).mean())
    assert snr > 25, snr  # ADPCM keeps ~30+ dB on a smooth sine
    h1 = audio_envelope_bits(sig)
    h2 = audio_envelope_bits(dec2)
    assert bin(h1 ^ h2).count("1") <= 4

    # with a `fact` chunk the decoder drops the final block's encoder
    # pad, so the UNTRIMMED decode hashes near the original too (the
    # spec-correct true-sample-count path)
    from adampro_spark.pipeline.multimodal import _riff_chunk

    fmtc = (
        (0x11).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + (16_000).to_bytes(4, "little")
        + (8_000).to_bytes(4, "little")
        + ba.to_bytes(2, "little")
        + (4).to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + _riff_chunk(b"fmt ", fmtc)
        + _riff_chunk(b"fact", len(sig).to_bytes(4, "little"))
        + _riff_chunk(b"data", enc)
    )
    blob3 = b"RIFF" + len(body).to_bytes(4, "little") + body
    dec3, _ = decode_wav(blob3)
    assert len(dec3) == len(sig)
    assert bin(h1 ^ audio_envelope_bits(dec3)).count("1") <= 4


def test_stream_media_gates_match_batch(spark, tmp_path):
    """The media probe gates stream: a file-source stream through
    stream_media_gates keeps exactly the rows batch curate_media's
    stage 1 keeps, with the probed metadata attached."""
    from adampro_spark.pipeline.multimodal import (
        curate_media,
        encode_bmp,
        encode_wav,
    )
    from adampro_spark.streaming.ingest import stream_media_gates

    big = (np.add.outer(np.arange(16) * 5, np.arange(16) * 3) % 256).astype(
        np.uint8
    )
    small = np.full((4, 4), 7, dtype=np.uint8)
    rows = [
        (0, bytearray(encode_bmp(big))),
        (1, bytearray(small.tobytes())),        # junk -> unknown
        (2, bytearray(encode_bmp(small))),      # under the floor
        (3, bytearray(encode_wav(np.zeros(200, dtype=np.int16)))),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    batch_out, _ = curate_media(
        df, min_width=8, min_height=8, dedup=None
    )
    want = {r["media_id"] for r in batch_out.collect()}

    src = str(tmp_path / "media_src")
    df.write.parquet(src)
    stream = spark.readStream.schema("media_id long, content binary").parquet(
        src
    )
    gated = stream_media_gates(stream, min_width=8, min_height=8)
    q = (
        gated.writeStream.format("memory")
        .queryName("media_gate_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_media"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT media_id, format FROM media_gate_stream"
    ).collect()
    assert {r["media_id"] for r in got} == want
    fmts = {r["media_id"]: r["format"] for r in got}
    assert fmts[0] == "bmp" and fmts[3] == "wav"


def test_video_frame_dhash_is_order_sensitive(spark):
    """Per-frame video hashes distinguish a REVERSED clip (which the
    mean-frame video_dhash cannot): frame-anchored hashes match the
    original only in original order; undecodable blobs emit zero rows."""
    from adampro_spark.pipeline.multimodal import (
        encode_avi_mjpeg,
        video_dhash,
        video_frame_dhash,
    )

    h, w = 20, 24
    f1 = (np.add.outer(np.arange(h) * 9, np.arange(w) * 5) % 256).astype(
        np.uint8
    )
    f2 = (255 - f1).astype(np.uint8)
    fwd = encode_avi_mjpeg([f1, f2], quant=1)
    rev = encode_avi_mjpeg([f2, f1], quant=1)
    df = spark.createDataFrame(
        [(0, fwd), (1, rev), (2, b"RIFF\x00\x00\x00\x00AVI junk")],
        "media_id long, content binary",
    )
    mean_h = {r["media_id"]: r["dhash"] for r in video_dhash(df).collect()}
    assert mean_h[0] == mean_h[1]  # the documented mean-frame blind spot
    per = {
        (r["media_id"], r["frame_no"]): r["dhash"]
        for r in video_frame_dhash(df).collect()
    }
    assert set(k[0] for k in per) == {0, 1}  # junk emits zero rows
    assert per[(0, 0)] == per[(1, 1)] and per[(0, 1)] == per[(1, 0)]
    assert per[(0, 0)] != per[(0, 1)]  # frames are distinct
    # frame-anchored equality holds only in matching order
    assert [per[(0, i)] for i in (0, 1)] != [per[(1, i)] for i in (0, 1)]


def test_media_probe_webp_flac_header_only():
    """Probe-only coverage of the modern-web formats the engine does
    not decode: WebP dims for all three bitstream flavors (hand-crafted
    headers per spec — the probe never touches pixel data) and FLAC
    STREAMINFO rate/total-samples; such blobs pass curate gates and
    ride through dedup untouched."""
    from adampro_spark.pipeline.multimodal import media_probe

    def webp(tag: bytes, payload: bytes) -> bytes:
        chunk = tag + len(payload).to_bytes(4, "little") + payload
        body = b"WEBP" + chunk
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    # VP8 lossy keyframe: 3 frame-tag bytes, 9d012a start code, dims
    vp8 = webp(
        b"VP8 ",
        b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + (320).to_bytes(2, "little") + (240).to_bytes(2, "little"),
    )
    p = media_probe(vp8)
    assert (p["format"], p["width"], p["height"]) == ("webp", 320, 240)

    # VP8L lossless: 0x2F then 14+14 packed bits (minus-one coded)
    bits = (319) | ((239) << 14)
    vp8l = webp(b"VP8L", bytes([0x2F]) + bits.to_bytes(4, "little"))
    p = media_probe(vp8l)
    assert (p["format"], p["width"], p["height"]) == ("webp", 320, 240)

    # VP8X extended: 24-bit canvas minus one at offsets 4/7
    vp8x = webp(
        b"VP8X",
        b"\x00\x00\x00\x00"
        + (639).to_bytes(3, "little") + (479).to_bytes(3, "little"),
    )
    p = media_probe(vp8x)
    assert (p["format"], p["width"], p["height"]) == ("webp", 640, 480)

    # FLAC STREAMINFO: rate 44100 at bits 80..99, total samples 36 bits
    si = bytearray(34)
    rate, total = 44_100, 1_234_567
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0x0F) << 4) | ((2 - 1) << 1)  # stereo
    si[13] = ((16 - 1) >> 4 & 0x01) << 4 | ((total >> 32) & 0x0F)
    si[14] = (total >> 24) & 0xFF
    si[15] = (total >> 16) & 0xFF
    si[16] = (total >> 8) & 0xFF
    si[17] = total & 0xFF
    flac = b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si)
    p = media_probe(flac)
    assert (p["format"], p["sample_rate"], p["n_frames"]) == (
        "flac", 44_100, 1_234_567,
    )


def test_webp_flac_ride_curate_gates(spark):
    from adampro_spark.pipeline.multimodal import curate_media, encode_bmp

    def webp_vp8():
        payload = (
            b"\x00\x00\x00" + b"\x9d\x01\x2a"
            + (64).to_bytes(2, "little") + (64).to_bytes(2, "little")
        )
        chunk = b"VP8 " + len(payload).to_bytes(4, "little") + payload
        body = b"WEBP" + chunk
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    img = (np.add.outer(np.arange(16) * 5, np.arange(16) * 3) % 256).astype(
        np.uint8
    )
    df = spark.createDataFrame(
        [(0, encode_bmp(img)), (1, webp_vp8()), (2, webp_vp8())],
        "media_id long, content binary",
    )
    out, rep = curate_media(df, min_width=8, min_height=8)
    # the two identical webp blobs ARE byte dups: the sha gate catches
    # them without any decode; the survivor enters the image family
    # (round 15: webp is a _DHASH_FORMATS member) where the LOSSY
    # codec hashes to an honest NULL — counted, never crashing
    assert {r["media_id"] for r in out.collect()} == {0, 1}
    assert rep["n_exact_dropped"] == 1
    assert rep["n_undecodable"] == 1
    assert rep["n_bad_format"] == 0


def test_curate_media_hashes_palette_png(spark):
    """A palette PNG is now a first-class image in curate_media: a
    palette re-encode of a BMP near-dups with it instead of passing
    through as undecodable."""
    import zlib as _z

    from adampro_spark.pipeline.multimodal import (
        _PNG_MAGIC,
        _png_chunk,
        curate_media,
        decode_png,
        encode_bmp,
    )

    h, w = 16, 16
    gray = (np.add.outer(np.arange(h) * 16, np.arange(w) * 3) % 256).astype(
        np.uint8
    )
    # palette = identity grayscale: index v -> (v, v, v)
    plte = b"".join(bytes([v, v, v]) for v in range(256))
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    pal_png = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", _z.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert (decode_png(pal_png) == gray).all()  # identity palette
    df = spark.createDataFrame(
        [(0, encode_bmp(gray)), (1, pal_png)],
        "media_id long, content binary",
    )
    out, rep = curate_media(df)
    assert {r["media_id"] for r in out.collect()} == {0}
    assert rep["n_neardup_dropped_image"] == 1
    assert rep["n_undecodable"] == 0


# ---------------------------------------------------------------------------
# Incremental eCP index maintenance (verdict r13 #7)
# ---------------------------------------------------------------------------


def test_ecp_append_incremental_maintenance(spark, tmp_path):
    """insert → append → the EXACT index paths (cell-bound kNN, radius)
    equal brute force over the grown corpus: appended rows get the same
    argmin cells a rebuild with these leaders would assign, counts/radii
    stay sound (radii only grow), the parquet append lands inside the
    existing cell layout, and the staleness flag clears."""
    import glob
    import os

    from pyspark.sql import functions as F

    from adampro_spark.index.ecp import FEATURE_COL, ecp_knn, ecp_radius
    from adampro_spark.index._util import np_distance
    from adampro_spark.operators.scan import (
        DISTANCE_COL,
        radius_scan,
        sequential_scan,
    )
    from adampro_spark.ops import AdamOps

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    q = [round(0.1 * ((i * 7) % 13) - 0.5, 4) for i in range(64)]

    ops = AdamOps(spark, str(tmp_path / "cat"))
    ops.index.create_from_df("e_app", "embapp", base, "embedding", "ecp", pk="vec_id")
    cells_before = set(
        glob.glob(os.path.join(ops.catalog.index_path("e_app"), f"{FEATURE_COL}=*"))
    )
    old_meta = ops.index.load("e_app")[1]
    # the insert path flags indexes stale via bump_version; mark directly
    data = ops.catalog._read()
    data["indexes"]["e_app"]["stale"] = True
    ops.catalog._write(data)

    idx_df, meta = ops.index.append("e_app", batch)
    assert ops.catalog.index("e_app")["stale"] is False

    # appended assignments = brute argmin over the FROZEN leaders
    leaders = np.array(meta["leaders"], dtype=np.float64)
    assert meta["leaders"] == old_meta["leaders"]
    appended = {
        r["vec_id"]: r[FEATURE_COL]
        for r in idx_df.join(batch.select("vec_id"), "vec_id", "left_semi").collect()
    }
    vecs = {r["vec_id"]: r["embedding"] for r in batch.collect()}
    assert set(appended) == set(vecs)
    for vid, cell in list(appended.items())[:50]:
        d = np_distance(np.array(vecs[vid], dtype=np.float64), leaders, "euclidean")
        assert int(np.argmin(d)) == cell
    # counts grew to the union; radii only grew
    assert sum(meta["counts"]) == emb.count()
    assert all(
        new >= old for new, old in zip(meta["radii"], old_meta["radii"])
    )
    # parquet append stayed inside the cell layout (no stray dirs)
    cells_after = set(
        glob.glob(os.path.join(ops.catalog.index_path("e_app"), f"{FEATURE_COL}=*"))
    )
    assert cells_after >= cells_before

    # EXACT paths over the grown corpus == brute force (what a rebuild
    # guarantees; both paths are exact, so rebuild-equality = brute-equality)
    want = [
        (r["vec_id"], round(r[DISTANCE_COL], 6))
        for r in sequential_scan(emb, "embedding", q, 10, "euclidean", pk="vec_id").collect()
    ]
    got = [
        (r["vec_id"], round(r[DISTANCE_COL], 6))
        for r in ecp_knn(
            emb, "embedding", idx_df, meta, q, 10, cell_bound=True
        ).collect()
    ]
    assert got == want

    rad = want[-1][1] + 1e-6
    want_r = sorted(
        (r["vec_id"], round(r[DISTANCE_COL], 6))
        for r in radius_scan(emb, "embedding", q, rad, "euclidean", pk="vec_id").collect()
    )
    got_r = sorted(
        (r["vec_id"], round(r[DISTANCE_COL], 6))
        for r in ecp_radius(emb, "embedding", idx_df, meta, q, rad).collect()
    )
    assert got_r == want_r

    # round 15: every vector family appends now (vaf included) — the
    # rebuild-only refusal moved to fulltext, covered in
    # test_round15_ops.test_lsh_sh_mi_pq_append_encode_identity
    ops.index.create_from_df("e_vaf_app", "embapp", base, "embedding", "vaf", pk="vec_id")
    vaf_idx, vaf_meta = ops.index.append("e_vaf_app", batch)
    assert vaf_idx.count() == emb.count()


def test_ivfpq_append_incremental_maintenance(spark, tmp_path):
    """IVF-PQ appends with FROZEN leaders + codebooks: appended rows'
    (cell, codes) are bit-identical to a build-time encode of the same
    vectors (numpy reference), counts/n grow to the union, the parquet
    append stays inside the cell layout, staleness clears, and the
    scan over the grown corpus retrieves the planted exact twin of the
    query first."""
    import glob
    import os

    from pyspark.sql import functions as F

    from adampro_spark.index.ivfpq import CELL_COL, FEATURE_COL
    from adampro_spark.operators.scan import DISTANCE_COL
    from adampro_spark.ops import AdamOps

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)

    ops = AdamOps(spark, str(tmp_path / "cat"))
    ops.index.create_from_df(
        "pq_app", "embapp", base, "embedding", "ivfpq", pk="vec_id"
    )
    old_meta = ops.index.load("pq_app")[1]
    data = ops.catalog._read()
    data["indexes"]["pq_app"]["stale"] = True
    ops.catalog._write(data)

    idx_df, meta = ops.index.append("pq_app", batch)
    assert ops.catalog.index("pq_app")["stale"] is False
    assert meta["leaders"] == old_meta["leaders"]
    assert meta["codebooks"] == old_meta["codebooks"]
    assert sum(meta["counts"]) == emb.count() == meta["n"]
    cells = glob.glob(
        os.path.join(ops.catalog.index_path("pq_app"), f"{CELL_COL}=*")
    )
    assert len(cells) > 1

    # appended codes == numpy reference encode with the frozen model
    L = np.array(meta["leaders"], dtype=np.float64)
    cbs = [np.array(cb, dtype=np.float64) for cb in meta["codebooks"]]
    bounds = [tuple(b) for b in meta["bounds"]]
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in batch.collect()}
    got = {
        r["vec_id"]: (r[CELL_COL], list(r[FEATURE_COL]))
        for r in idx_df.join(
            batch.select("vec_id"), "vec_id", "left_semi"
        ).collect()
    }
    assert set(got) == set(vecs)
    for vid in list(got)[:40]:
        v = vecs[vid]
        cell = int(((v[None, :] - L) ** 2).sum(axis=1).argmin())
        r = v - L[cell]
        codes = [
            int(((r[s:s + ln][None, :] - cb) ** 2).sum(axis=1).argmin())
            for (s, ln), cb in zip(bounds, cbs)
        ]
        assert got[vid] == (cell, codes), vid

    # a query at an APPENDED vector retrieves that vector first
    probe_id = next(iter(vecs))
    res = ops.query.index(
        "pq_app", [float(x) for x in vecs[probe_id]], 5, "euclidean", df=emb
    ).collect()
    assert res[0]["vec_id"] == probe_id
    assert res[0][DISTANCE_COL] == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# Full-inventory stop-word routing (verdict r13 #3)
# ---------------------------------------------------------------------------

_IT_DOC = (
    "il gatto è nella casa e i bambini non sono che per una volta con "
    "le cose di un amico di strada che viene per una visita con le sue "
    "storie di mare e di montagna che sono per il piccolo paese una "
    "festa di colori che non finisce"
)
_PT_DOC = (
    "o cachorro não está em casa para que os meninos de uma rua com um "
    "amigo possam ver a bola que rola para o campo de uma cidade com "
    "um rio onde os barcos de pesca voltam para a praia com o vento"
)


def test_stopwords_cover_full_langid_inventory():
    """Every language the trained langid knows has its own frozen
    10-word list (round 14) — the r12 bug class (a non-English doc
    scored against English stop words) cannot recur for any code the
    detector can emit; the HEURISTIC langid stays frozen at five."""
    from adampro_spark.pipeline.langid import SEED_TEXTS
    from adampro_spark.pipeline.text import (
        HEURISTIC_LANGID_LANGS,
        STOPWORDS,
    )

    assert set(SEED_TEXTS) <= set(STOPWORDS)
    assert all(len(v) == 10 for v in STOPWORDS.values())
    assert HEURISTIC_LANGID_LANGS == ("de", "en", "es", "fr", "zh")


def test_stopword_gate_routes_italian_portuguese(spark):
    """The r13 fr/de fix extended to it/pt: routed stopword_ratio and
    the routed Gopher required-word rule read the document's OWN list;
    the full-map langid sweep (langs=) detects both plants."""
    from adampro_spark.pipeline.curate import gopher_gate_flags
    from pyspark.sql import functions as F

    from adampro_spark.pipeline.text import (
        STOPWORDS,
        langid_expr,
        stopword_ratio_expr,
        tokens_expr,
    )

    df = spark.createDataFrame(
        [(1, _IT_DOC), (2, _PT_DOC)], "doc_id long, text string"
    )
    staged = df.withColumn("_tk", tokens_expr("text")).withColumn(
        "_lg",
        langid_expr("text", toks=F.col("_tk"), langs=tuple(sorted(STOPWORDS))),
    )
    langs = {r["doc_id"]: r["_lg"] for r in staged.collect()}
    assert langs == {1: "it", 2: "pt"}

    ratios = staged.select(
        "doc_id",
        F.round(stopword_ratio_expr(F.col("_tk")), 4).alias("en_keyed"),
        F.round(
            stopword_ratio_expr(F.col("_tk"), lang_col=F.col("_lg")), 4
        ).alias("routed"),
    )
    got = {r["doc_id"]: (r["en_keyed"], r["routed"]) for r in ratios.collect()}
    for did in (1, 2):
        assert got[did][0] < 0.05, got  # English list reads near-zero
        assert got[did][1] > 0.2, got   # own list reads healthy

    routed_req = staged.select(
        "doc_id",
        gopher_gate_flags(
            toks=F.col("_tk"), min_words=10, lang_col=F.col("_lg")
        )["_g_required"].alias("req"),
    )
    assert all(r["req"] for r in routed_req.collect())


def test_fingerprint_pairs_null_dropped_negative_raises(spark):
    from adampro_spark.pipeline.dedup import fingerprint_pairs

    df = spark.createDataFrame(
        [(1, 12345), (2, 12345), (3, None)], "doc_id long, fp long"
    )
    pairs = fingerprint_pairs(df, "fp", pk="doc_id", nbits=63).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]

    bad = spark.createDataFrame([(1, -5), (2, -5)], "doc_id long, fp long")
    with pytest.raises(Exception, match="NONNEGATIVE"):
        fingerprint_pairs(bad, "fp", pk="doc_id", nbits=63).collect()


def test_fingerprint_against_null_dropped(spark):
    from adampro_spark.pipeline.dedup import fingerprint_against

    new = spark.createDataFrame(
        [(1, 999), (2, None), (3, 12)], "doc_id long, fp long"
    )
    ref = spark.createDataFrame([(10, 999), (11, None)], "doc_id long, fp long")
    out = fingerprint_against(new, ref, "fp", pk="doc_id", nbits=63)
    # 1 matches ref 10 and drops; the NULL rows pass through untouched
    assert {r["doc_id"] for r in out.collect()} == {2, 3}
