"""Round-15 operators.

Covers the verdict-r14 list: the two-phase τ tightening + pruning
telemetry on the exact eCP cell bound (#4/#6), animated-GIF routing
through the video modality (#3), and the codec/append work added this
round (tested in their own files as they land).
"""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# eCP exact cell bound: phase-2 τ tightening + telemetry (verdict r14 #4)
# ---------------------------------------------------------------------------

def test_ecp_cell_bound_phase2_prunes_loose_radii(spark):
    """The leader-geometry τ (d+radius of the seed cell) is loose when
    the seed cell holds one far outlier (radius 30): its ub (30.0)
    wins the seed ordering yet its loose τ would keep the cell at
    distance 30 (lb ≈ 29.7).  The phase-2 τ — the exact kth distance among
    the seed cell's own rows (~0.5 here) — must prune that cell, the
    result must still equal brute force, and LAST_BOUND_STATS must
    record the pruned shape."""
    from adampro_spark.index.ecp import (
        FEATURE_COL,
        LAST_BOUND_STATS,
        ecp_knn,
    )
    from adampro_spark.operators.scan import DISTANCE_COL, sequential_scan

    rng = np.random.RandomState(15)
    rows, cells = [], []
    vid = 0
    # cell 0: 10 points near the origin + one outlier at x=-30
    for _ in range(10):
        rows.append((vid, (rng.standard_normal(4) * 0.1).tolist()))
        cells.append((vid, 0))
        vid += 1
    rows.append((vid, [-30.0, 0.0, 0.0, 0.0]))
    cells.append((vid, 0))
    vid += 1
    # cells 1 and 2: tight clusters at x=30 and x=60
    for ci, cx in ((1, 30.0), (2, 60.0)):
        for _ in range(10):
            v = rng.standard_normal(4) * 0.1
            v[0] += cx
            rows.append((vid, v.tolist()))
            cells.append((vid, ci))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = spark.createDataFrame(cells, f"vec_id long, {FEATURE_COL} int")
    pts = {r[0]: np.array(r[1]) for r in rows}
    leaders = [[0.0] * 4, [30.0, 0.0, 0.0, 0.0], [60.0, 0.0, 0.0, 0.0]]
    radii = [
        max(
            float(np.linalg.norm(pts[v] - np.array(leaders[c])))
            for v, c in cells
            if c == ci
        )
        for ci in range(3)
    ]
    meta = {
        "type": "ecp",
        "pk": "vec_id",
        "distance": "euclidean",
        "leaders": leaders,
        "counts": [11, 10, 10],
        "radii": radii,
    }
    assert 29 < radii[0] < 30.01  # loose bound ≈ the cell-1 lower bound

    q = [0.0, 0.0, 0.0, 0.0]
    got = [
        (r["vec_id"], round(r[DISTANCE_COL], 6))
        for r in ecp_knn(
            df, "embedding", idx, meta, q, 5, cell_bound=True
        ).collect()
    ]
    brute = [
        (r["vec_id"], round(r[DISTANCE_COL], 6))
        for r in sequential_scan(
            df, "embedding", q, 5, "euclidean", pk="vec_id"
        ).collect()
    ]
    assert got == brute
    st = dict(LAST_BOUND_STATS)
    # loose τ (30.0) would keep cell 1 (lb ≈ 29.7); phase-2 τ (≈0.5) prunes
    # both non-seed cells
    assert st["cells_total"] == 3 and st["cells_read"] == 1
    assert st["rows_total"] == 31 and st["rows_read"] == 11
    assert st["tau"] < 1.0


# ---------------------------------------------------------------------------
# Animated GIFs through the video modality (verdict r14 #3)
# ---------------------------------------------------------------------------

def _anim(frames):
    from adampro_spark.pipeline.multimodal import encode_gif

    return encode_gif(frames)


def test_decode_gif_frames_composites_in_stream_order():
    """All frames decode (not just frame 1), compositing onto the
    running screen, with every_n striding the returned list."""
    from adampro_spark.pipeline.multimodal import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
    )

    rng = np.random.RandomState(151)
    f = [rng.randint(0, 256, size=(16, 20), dtype=np.int64).astype(np.uint8)
         for _ in range(5)]
    blob = encode_gif(f)
    frames = decode_gif_frames(blob)
    assert len(frames) == 5
    for got, want in zip(frames, f):
        assert np.array_equal(got, want)
    # frame 1 of the stream == decode_gif (the image-modality contract)
    assert np.array_equal(frames[0], decode_gif(blob))
    assert len(decode_gif_frames(blob, every_n=2)) == 3


def test_animated_gif_video_routing(spark):
    """The verdict-r14 #3 contract: two animations sharing a title card
    do NOT pair, a re-encode (retouched copy) DOES, and a reversed
    animation differs under the frame-anchored hash; single-frame GIFs
    stay in the image modality."""
    from adampro_spark.pipeline.dedup import fingerprint_pairs
    from adampro_spark.pipeline.multimodal import (
        curate_media,
        video_dhash,
        video_frame_dhash,
    )

    rng = np.random.RandomState(152)

    def rnd():
        return rng.randint(0, 256, (16, 20), np.int64).astype(np.uint8)

    title = rnd()
    a_frames = [title, rnd(), rnd(), rnd()]
    b_frames = [title, rnd(), rnd(), rnd()]  # same title card, new body
    a_touch = [f.copy() for f in a_frames]
    a_touch[2] = np.clip(a_touch[2].astype(np.int16) + 3, 0, 255).astype(
        np.uint8
    )  # retouched re-encode of A
    rows = [
        (0, _anim(a_frames)),
        (1, _anim(b_frames)),
        (2, _anim(a_touch)),
        (3, _anim(list(reversed(a_frames)))),
        (4, _anim([title])),          # single-frame: image modality
        (5, _anim([title])),          # its exact twin
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")

    vd = {r["media_id"]: r["dhash"]
          for r in video_dhash(df.filter("media_id < 4")).collect()}
    assert None not in vd.values()
    pairs = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in fingerprint_pairs(
            video_dhash(df.filter("media_id < 4")), "dhash",
            pk="media_id", max_hamming=6, nbits=63,
        ).collect()
    }
    assert (0, 2) in pairs          # re-encode pairs with its source
    assert (0, 1) not in pairs      # shared title card does NOT pair
    # mean-frame hash is order-invariant (documented) — the REVERSED
    # clip pairs at clip level but must differ frame-anchored:
    fd = video_frame_dhash(df.filter("media_id in (0, 3)"))
    rowsf = {(r["media_id"], r["frame_no"]): r["dhash"] for r in fd.collect()}
    n = 4
    anchored_equal = [
        rowsf[(0, i)] == rowsf[(3, i)] for i in range(n)
    ]
    assert not all(anchored_equal)

    # curate_media routes n_frames>1 through video, keeps single-frame
    # gifs in image: exact twin 5 drops in the EXACT stage, re-encode 2
    # drops via video near-dup, 1 and 3 survive (3: mean-frame invariance
    # keeps it a near-dup of 0 — it drops too; that is the documented
    # clip-level semantics)
    survivors, report = curate_media(df)
    ids = {r["media_id"] for r in survivors.collect()}
    assert report["n_exact_dropped"] == 1      # 5 (byte-identical to 4)
    assert report["n_neardup_dropped_video"] >= 1
    assert 0 in ids and 1 in ids and 4 in ids
    assert 2 not in ids and 5 not in ids
    assert report["n_undecodable"] == 0


# ---------------------------------------------------------------------------
# Sub-byte PNG decode (verdict r14 #7)
# ---------------------------------------------------------------------------

def test_subbyte_png_exact_vs_external_encoder():
    """1/2/4-bit gray and 4-bit palette PNGs written by JDK ImageIO
    decode exactly (left-bit replication for gray, PLTE luma for
    palette) — external bytes, zero tolerance."""
    import os

    from adampro_spark.pipeline.multimodal import decode_png

    res = os.path.join(os.path.dirname(__file__), "resources", "png")
    n = 17
    for f, scale, fml in (
        ("subbyte_gray1", 255, lambda x, y: (x * 3 + y * 5) % 2),
        ("subbyte_pal2", 85, lambda x, y: (x + y * 3) % 4),
        ("subbyte_pal4", 17, lambda x, y: (x * 7 + y * 11) % 16),
    ):
        with open(os.path.join(res, f + ".png"), "rb") as fh:
            got = decode_png(fh.read())
        want = np.array(
            [[fml(x, y) * scale for x in range(n)] for y in range(n)],
            dtype=np.uint8,
        )
        assert np.array_equal(got, want), f
    pal = [(i * 16, (i * 32) % 256, 255 - i * 17) for i in range(16)]
    with open(os.path.join(res, "subbyte_pal4c.png"), "rb") as fh:
        blob = fh.read()
    want = np.array(
        [
            [
                sum(
                    c * m
                    for c, m in zip(pal[(x * 7 + y * 11) % 16], (299, 587, 114))
                )
                // 1000
                for x in range(n)
            ]
            for y in range(n)
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(decode_png(blob), want)
    wantrgb = np.array(
        [[pal[(x * 7 + y * 11) % 16] for x in range(n)] for y in range(n)],
        dtype=np.uint8,
    )
    assert np.array_equal(decode_png(blob, rgb=True), wantrgb)


def _pack_subbyte_rows(vals: np.ndarray, depth: int) -> bytes:
    """Pack (h × w) samples into MSB-first byte-padded filter-0
    scanlines (the hand-built sibling of the JDK fixtures, letting the
    tests choose filters/values the external encoder would not)."""
    h, w = vals.shape
    out = bytearray()
    for y in range(h):
        bits = np.zeros(((w * depth + 7) // 8) * 8, dtype=np.uint8)
        for x in range(w):
            v = int(vals[y, x])
            for k in range(depth):
                bits[x * depth + k] = (v >> (depth - 1 - k)) & 1
        out += b"\x00" + np.packbits(bits).tobytes()
    return bytes(out)


def test_subbyte_palette_png_near_dups_with_8bit_twin(spark):
    """The verdict-r14 #7 done-criterion: a 4-bit palette PNG and its
    8-bit twin decode to the same luma grid, so curate_media's image
    near-dup collapses them."""
    import zlib

    from adampro_spark.pipeline.multimodal import (
        _PNG_MAGIC,
        _png_chunk,
        curate_media,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(154)
    idx = rng.randint(0, 16, size=(16, 16))
    gray8 = (idx * 17).astype(np.uint8)
    blob8 = encode_png(gray8)

    ihdr = (16).to_bytes(4, "big") * 2 + bytes([4, 3, 0, 0, 0])
    plte = bytes(v for i in range(16) for v in (i * 17, i * 17, i * 17))
    raw = _pack_subbyte_rows(idx, 4)
    blob4 = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob4), gray8)

    other = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    df = spark.createDataFrame(
        [(0, blob8), (1, blob4), (2, encode_png(other))],
        "media_id long, content binary",
    )
    out, report = curate_media(df)
    assert {r["media_id"] for r in out.collect()} == {0, 2}
    assert report["n_neardup_dropped_image"] == 1
    assert report["n_undecodable"] == 0


def test_subbyte_png_filters_and_invalid_depths():
    """Sub-byte rows defilter at byte distance 1 (Up/Sub over packed
    bytes), and spec-invalid combos still raise."""
    import zlib

    from adampro_spark.pipeline.multimodal import (
        _PNG_MAGIC,
        _png_chunk,
        decode_png,
    )

    # depth-2 gray, rows filtered: row0 None, row1 Up, row2 Sub
    vals = np.array(
        [[0, 1, 2, 3, 3, 2, 1, 0, 1], [1, 2, 3, 0, 0, 3, 2, 1, 2],
         [3, 3, 0, 0, 1, 1, 2, 2, 3]]
    )
    h, w = vals.shape
    stride = (w * 2 + 7) // 8

    def pack_row(row):
        bits = np.zeros(stride * 8, dtype=np.uint8)
        for x, v in enumerate(row):
            bits[2 * x] = (v >> 1) & 1
            bits[2 * x + 1] = v & 1
        return np.packbits(bits)

    rows = [pack_row(r) for r in vals]
    raw = bytes([0]) + rows[0].tobytes()
    raw += bytes([2]) + ((rows[1].astype(int) - rows[0]) % 256).astype(
        np.uint8
    ).tobytes()
    sub = np.empty(stride, dtype=np.uint8)
    prev = 0
    for i in range(stride):
        sub[i] = (int(rows[2][i]) - prev) % 256
        prev = int(rows[2][i])
    raw += bytes([1]) + sub.tobytes()
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([2, 0, 0, 0, 0])
    blob = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), (vals * 85).astype(np.uint8))

    # sub-byte TRUECOLOR is spec-invalid: must still raise
    bad = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([4, 2, 0, 0, 0])
    blob_bad = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", bad)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(blob_bad)


# ---------------------------------------------------------------------------
# Non-interleaved baseline JPEG scans (verdict r14 #8)
# ---------------------------------------------------------------------------

def test_noninterleaved_baseline_jpeg_decodes_identically():
    """A non-interleaved baseline stream (one SOS per component, T.81
    A.2.2 block-grid MCUs) must decode pixel-identical to the
    interleaved stream of the same planes — gray, 4:4:4 and 4:2:0,
    with and without restart markers, luma and rgb paths."""
    from adampro_spark.pipeline.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(155)
    g = rng.randint(0, 256, (21, 19), np.int64).astype(np.uint8)
    c = rng.randint(0, 256, (17, 23, 3), np.int64).astype(np.uint8)
    for img, sub, ris in ((g, False, (0, 3)), (c, False, (0, 4)),
                          (c, True, (0, 2))):
        for ri in ris:
            b_i = encode_jpeg(img, quant=1, subsample=sub,
                              restart_interval=ri)
            b_n = encode_jpeg(img, quant=1, subsample=sub,
                              restart_interval=ri, interleave=False)
            if img.ndim == 3:
                assert b_i != b_n  # genuinely different streams (for
                # 1-component 1x1 the two MCU definitions coincide)
            for rgb in ((False, True) if img.ndim == 3 else (False,)):
                assert np.array_equal(
                    decode_jpeg(b_i, rgb=rgb), decode_jpeg(b_n, rgb=rgb)
                ), (img.shape, sub, ri, rgb)

    # malformed band bytes on a per-component scan still raise (the
    # gray 1-component stream stays on the inline interleaved path, so
    # corrupt the COLOR non-interleaved stream's first SOS)
    blob = bytearray(encode_jpeg(c, quant=1, interleave=False))
    i = blob.find(b"\xff\xda")
    assert i > 0
    # SOS payload: len(2) ns(1) comp(2) Ss Se Ah/Al — corrupt Se
    blob[i + 2 + 2 + 1 + 2 + 1] = 31
    with pytest.raises(ValueError, match="Se=63"):
        decode_jpeg(bytes(blob))


def test_noninterleaved_jpeg_through_curate_media(spark):
    """The verdict-r14 #8 done-criterion: a per-component-scan JPEG is
    no longer counted undecodable by curate_media — it decodes and
    near-dups with its interleaved twin."""
    from adampro_spark.pipeline.multimodal import curate_media, encode_jpeg

    rng = np.random.RandomState(156)
    img = rng.randint(0, 256, (24, 24, 3), np.int64).astype(np.uint8)
    other = rng.randint(0, 256, (24, 24), np.int64).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (0, encode_jpeg(img, quant=1)),
            (1, encode_jpeg(img, quant=1, interleave=False)),
            (2, encode_jpeg(other, quant=1)),
        ],
        "media_id long, content binary",
    )
    out, report = curate_media(df)
    assert {r["media_id"] for r in out.collect()} == {0, 2}
    assert report["n_undecodable"] == 0
    assert report["n_neardup_dropped_image"] == 1


# ---------------------------------------------------------------------------
# Incremental append for the remaining index families (verdict r14 #4)
# ---------------------------------------------------------------------------

def _split_emb(spark):
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    return emb, base, batch


def test_va_append_exact_with_out_of_envelope_batch(spark, tmp_path):
    """VA-F append through AdamOps: staleness clears, appended cells
    equal a frozen-marks encode, and the EXACT candidate contract holds
    over the grown corpus even for a batch vector pushed OUTSIDE the
    build envelope (the widened outer marks keep edge-cell bounds
    sound)."""
    from pyspark.sql import functions as F

    from adampro_spark.index.va import FEATURE_COL, va_knn
    from adampro_spark.operators.scan import DISTANCE_COL, sequential_scan
    from adampro_spark.ops import AdamOps

    emb, base, batch = _split_emb(spark)
    # push one appended vector far outside the build envelope
    batch = batch.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") == 10,
            F.transform("embedding", lambda x: x * 5.0 + 3.0),
        ).otherwise(F.col("embedding")),
    )
    grown = base.unionByName(batch)

    ops = AdamOps(spark, str(tmp_path / "cat"))
    ops.index.create_from_df("v_app", "embva", base, "embedding", "vaf", pk="vec_id")
    old_meta = ops.index.load("v_app")[1]
    data = ops.catalog._read()
    data["indexes"]["v_app"]["stale"] = True
    ops.catalog._write(data)

    idx_df, meta = ops.index.append("v_app", batch)
    assert ops.catalog.index("v_app")["stale"] is False
    # inner marks frozen; outer marks only widened
    for old_mk, new_mk in zip(old_meta["marks"], meta["marks"]):
        assert old_mk[1:-1] == new_mk[1:-1]
        assert new_mk[0] <= old_mk[0] and new_mk[-1] >= old_mk[-1]
    assert idx_df.count() == emb.count()

    # exact candidate contract on the grown corpus, including a query
    # near the out-of-envelope vector
    far_q = [3.0] * 64
    for q, k in ((far_q, 7), ([0.1] * 64, 11)):
        want = [
            (r["vec_id"], round(r[DISTANCE_COL], 6))
            for r in sequential_scan(
                grown, "embedding", q, k, "euclidean", pk="vec_id"
            ).collect()
        ]
        got = [
            (r["vec_id"], round(r[DISTANCE_COL], 6))
            for r in va_knn(
                grown, "embedding", idx_df, meta, q, k, "euclidean"
            ).collect()
        ]
        assert got == want, (k,)
    # the pushed vector is the top hit for its own neighborhood
    top = va_knn(grown, "embedding", idx_df, meta, far_q, 1, "euclidean").first()
    assert top["vec_id"] == 10


def test_vav_and_vaplus_append_exact(spark):
    """VAV and VA+ appends: frozen inner marks (+frozen PCA), exact
    kNN over the grown corpus equals brute force."""
    from adampro_spark.index.va import build_va, va_append, va_knn
    from adampro_spark.index.vaplus import (
        build_vaplus,
        vaplus_append,
        vaplus_knn,
    )
    from adampro_spark.operators.scan import DISTANCE_COL, sequential_scan

    emb, base, batch = _split_emb(spark)
    q = [round(0.05 * ((i * 5) % 11) - 0.2, 4) for i in range(64)]

    for build, append, knn, kw in (
        (build_va, va_append, va_knn, {"index_type": "vav"}),
        (build_vaplus, vaplus_append, vaplus_knn, {}),
    ):
        idx0, meta0 = build(base, "embedding", pk="vec_id", **kw)
        new_rows, meta1 = append(batch, "embedding", meta0)
        for old_mk, new_mk in zip(meta0["marks"], meta1["marks"]):
            assert old_mk[1:-1] == new_mk[1:-1]
        idx = idx0.unionByName(new_rows)
        want = [
            (r["vec_id"], round(r[DISTANCE_COL], 6))
            for r in sequential_scan(
                emb, "embedding", q, 9, "euclidean", pk="vec_id"
            ).collect()
        ]
        got = [
            (r["vec_id"], round(r[DISTANCE_COL], 6))
            for r in knn(emb, "embedding", idx, meta1, q, 9).collect()
        ]
        assert got == want, build.__name__


def test_lsh_sh_mi_pq_append_encode_identity(spark, tmp_path):
    """The lossy families: appended rows' features are BIT-IDENTICAL to
    the frozen-model encode a rebuild with this model would produce
    (numpy recompute per family), n grows, and the persisted append +
    staleness clear works through AdamOps for a plain-parquet family."""
    import numpy as np

    from adampro_spark.index._util import np_distance
    from adampro_spark.index.lsh import _buckets, build_lsh, lsh_append
    from adampro_spark.index.mi import build_mi, mi_append
    from adampro_spark.index.pq import build_pq, pq_append
    from adampro_spark.index.sh import _np_signature, build_sh, sh_append

    emb, base, batch = _split_emb(spark)
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in batch.collect()}
    n_base, n_batch = base.count(), batch.count()

    # LSH
    _, meta = build_lsh(base, "embedding", pk="vec_id", autofit=False)
    rows, m1 = lsh_append(batch, "embedding", meta)
    got = {r["vec_id"]: list(r["ap_indexfeature"]) for r in rows.collect()}
    V = np.stack([vecs[k] for k in sorted(vecs)])
    want = _buckets(V, meta)
    for i, k in enumerate(sorted(vecs)):
        assert got[k] == list(want[i]), ("lsh", k)

    # SH
    _, meta = build_sh(base, "embedding", pk="vec_id", autofit=False)
    rows, m1 = sh_append(batch, "embedding", meta)
    assert m1["n"] == n_base + n_batch
    got = {r["vec_id"]: list(r["ap_indexfeature"]) for r in rows.collect()}
    want = _np_signature(
        V, {k: meta[k] for k in ("pca", "min_proj", "eigenfunctions", "nbits")}
    )
    for i, k in enumerate(sorted(vecs)):
        assert got[k] == list(want[i]), ("sh", k)

    # MI
    _, meta = build_mi(base, "embedding", pk="vec_id", autofit=False)
    rows, m1 = mi_append(batch, "embedding", meta)
    assert m1["n"] == n_base + n_batch
    got = {r["vec_id"]: list(r["ap_indexfeature"]) for r in rows.collect()}
    refs = np.array(meta["refs"], dtype=np.float64)
    for k in list(sorted(vecs))[:40]:
        d = np_distance(vecs[k], refs, meta["distance"])
        order = np.argsort(
            np.array(list(zip(d, range(len(d)))), dtype=[("d", float), ("i", int)]),
            order=("d", "i"),
        )[: meta["ki"]]
        assert got[k] == [int(i) for i in order], ("mi", k)

    # flat PQ
    _, meta = build_pq(base, "embedding", pk="vec_id", autofit=False)
    rows, m1 = pq_append(batch, "embedding", meta)
    assert m1["n"] == n_base + n_batch
    got = {r["vec_id"]: list(r["ap_indexfeature"]) for r in rows.collect()}
    cbs = [np.asarray(cb) for cb in meta["codebooks"]]
    for k in list(sorted(vecs))[:40]:
        want_codes = []
        for (s, ln), cb in zip(meta["bounds"], cbs):
            d2 = ((vecs[k][s:s + ln][None, :] - cb) ** 2).sum(axis=1)
            want_codes.append(int(d2.argmin()))
        assert got[k] == want_codes, ("pq", k)

    # lifecycle through AdamOps for a plain-parquet family (sh)
    from adampro_spark.ops import AdamOps

    ops = AdamOps(spark, str(tmp_path / "cat"))
    ops.index.create_from_df("s_app", "embsh", base, "embedding", "sh", pk="vec_id")
    data = ops.catalog._read()
    data["indexes"]["s_app"]["stale"] = True
    ops.catalog._write(data)
    idx_df, meta = ops.index.append("s_app", batch)
    assert ops.catalog.index("s_app")["stale"] is False
    assert idx_df.count() == emb.count()
    # fulltext stays rebuild-only
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ops.index.create_from_df(
        "ft_app", "docsft", docs.select("doc_id", "text"), "text",
        "fulltext", pk="doc_id",
    )
    with pytest.raises(NotImplementedError, match="rebuild"):
        ops.index.append("ft_app", docs.limit(5))


# ---------------------------------------------------------------------------
# FLAC decode (verdict r14 #2)
# ---------------------------------------------------------------------------

def _flac_wrap(body_writer, n, bps=16, nch=1, ca=None, rate=16000):
    """Hand-build a single-frame FLAC stream: STREAMINFO + one frame
    whose subframe bits come from ``body_writer(wr)`` — lets tests
    exercise decode paths the fixture encoder never emits (LPC, wasted
    bits, stereo decorrelation, Rice2, partitions, odd depths)."""
    from adampro_spark.pipeline.multimodal import _crc8, _crc16, _FlacWriter

    out = bytearray(b"fLaC")
    si = bytearray()
    si += n.to_bytes(2, "big") * 2
    si += (0).to_bytes(3, "big") * 2
    si += bytes([
        (rate >> 12) & 0xFF,
        (rate >> 4) & 0xFF,
        ((rate & 0x0F) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4),
        (((bps - 1) & 0x0F) << 4) | 0,
    ])
    si += n.to_bytes(4, "big")
    si += bytes(16)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)
    wr = _FlacWriter()
    wr.u(0x3FFE, 14)
    wr.u(0, 2)
    wr.u(0b0111, 4)   # blocksize via 16-bit field
    wr.u(0b1101, 4)   # rate via 16-bit field
    wr.u(ca if ca is not None else nch - 1, 4)
    wr.u({8: 0b001, 16: 0b100, 24: 0b110}[bps], 3)
    wr.u(0, 1)
    wr.u(0, 8)        # frame number 0
    wr.u(n - 1, 16)
    wr.u(rate, 16)
    wr.u(_crc8(bytes(wr.buf)), 8)
    body_writer(wr)
    wr.align()
    body = wr.bytes()
    return bytes(out + body + _crc16(body).to_bytes(2, "big"))


def _write_verbatim(wr, vals, bits):
    wr.u(0, 1)
    wr.u(1, 6)
    wr.u(0, 1)
    for v in vals:
        wr.u(int(v), bits)


def test_flac_round_trip_and_transcode_identity():
    """encode_flac → decode_flac across subframe strategies and
    channel shapes; a FLAC transcode of a WAV clip decodes to the SAME
    int16 array (the pairing contract)."""
    from adampro_spark.pipeline.multimodal import (
        decode_audio,
        decode_flac,
        encode_flac,
        encode_wav,
    )

    rng = np.random.RandomState(157)
    s = (rng.standard_normal(9000) * 6000).astype(np.int16)
    for sub, order in (("fixed", 0), ("fixed", 2), ("fixed", 4),
                       ("verbatim", 0)):
        got, rate = decode_flac(
            encode_flac(s, 22050, block_size=4096, subframe=sub, order=order)
        )
        assert rate == 22050 and np.array_equal(got, s), (sub, order)
    c = np.full(5000, -1234, dtype=np.int16)
    assert np.array_equal(decode_flac(encode_flac(c))[0], c)
    st = (rng.standard_normal((5000, 2)) * 9000).astype(np.int16)
    got, _ = decode_flac(encode_flac(st, 44100))
    assert got.shape == (5000, 2) and np.array_equal(got, st)
    # transcode identity through the dispatcher
    ws, wr_ = decode_audio(encode_wav(s, 16000))
    fs, fr = decode_audio(encode_flac(ws, wr_))
    assert np.array_equal(ws, fs) and wr_ == fr


def test_flac_decode_only_paths_hand_built():
    """LPC subframes, wasted bits, all three stereo decorrelations,
    Rice2 + partition order > 0, and 8/24-bit depth normalization —
    streams hand-assembled per RFC 9639, expected values simulated in
    numpy."""
    from adampro_spark.pipeline.multimodal import decode_flac

    rng = np.random.RandomState(158)
    n = 200

    # LPC order 2, shift 1, qlp [3, -1]: x[i] = ((3*x[i-1] - x[i-2]) >> 1) + res
    warm = [100, 250]
    res = rng.randint(-40, 40, size=n - 2)
    x = list(warm)
    for r in res:
        x.append(((3 * x[-1] - 1 * x[-2]) >> 1) + int(r))

    def lpc_body(wr):
        wr.u(0, 1)
        wr.u(31 + 2, 6)   # LPC order 2
        wr.u(0, 1)
        for v in warm:
            wr.u(v, 16)
        wr.u(12 - 1, 4)   # precision 12
        wr.u(1, 5)        # shift 1
        for c in (3, -1):
            wr.u(c, 12)
        # residual: method Rice2 (5-bit), partition order 1
        wr.u(1, 2)
        wr.u(1, 4)
        half = n // 2
        parts = [res[: half - 2], res[half - 2:]]
        for part in parts:
            param = 4
            wr.u(param, 5)
            for v in part:
                zz = (int(v) << 1) ^ (int(v) >> 63)
                wr.u(0, zz >> param)
                wr.u(1, 1)
                wr.u(zz & ((1 << param) - 1), param)

    got, _ = decode_flac(_flac_wrap(lpc_body, n))
    assert np.array_equal(got, np.array(x, dtype=np.int16))

    # wasted bits: samples all << 1, subframe stores v >> 1 at bps-1
    vals = (rng.randint(-4000, 4000, size=n) << 1).astype(np.int16)

    def wasted_body(wr):
        wr.u(0, 1)
        wr.u(1, 6)        # VERBATIM
        wr.u(1, 1)        # wasted flag
        wr.u(1, 1)        # unary 0 -> wasted = 1
        for v in vals:
            wr.u(int(v) >> 1, 15)

    got, _ = decode_flac(_flac_wrap(wasted_body, n))
    assert np.array_equal(got, vals)

    # stereo decorrelations
    L = rng.randint(-8000, 8000, size=n).astype(np.int64)
    R = rng.randint(-8000, 8000, size=n).astype(np.int64)
    side = L - R
    mid = (L + R) >> 1

    def mk(ca):
        def body(wr):
            if ca == 8:    # left/side
                _write_verbatim(wr, L, 16)
                _write_verbatim(wr, side, 17)
            elif ca == 9:  # right/side (side first)
                _write_verbatim(wr, side, 17)
                _write_verbatim(wr, R, 16)
            else:          # mid/side
                _write_verbatim(wr, mid, 16)
                _write_verbatim(wr, side, 17)
        return body

    for ca in (8, 9, 10):
        got, _ = decode_flac(_flac_wrap(mk(ca), n, nch=2, ca=ca))
        assert np.array_equal(got[:, 0], L.astype(np.int16)), ca
        assert np.array_equal(got[:, 1], R.astype(np.int16)), ca

    # depth normalization: 8-bit << 8, 24-bit >> 8 (the WAV convention)
    v8 = rng.randint(-128, 128, size=n)
    got, _ = decode_flac(_flac_wrap(
        lambda wr: _write_verbatim(wr, v8, 8), n, bps=8))
    assert np.array_equal(got, (v8 << 8).astype(np.int16))
    v24 = rng.randint(-(1 << 23), 1 << 23, size=n)
    got, _ = decode_flac(_flac_wrap(
        lambda wr: _write_verbatim(wr, v24, 24), n, bps=24))
    assert np.array_equal(got, (v24 >> 8).astype(np.int16))

    # structural garbage raises (the corpus kernels turn this to NULL)
    with pytest.raises(ValueError):
        decode_flac(b"fLaC" + b"\x00" * 10)


def test_flac_joins_audio_neardup_family(spark):
    """The verdict-r14 #2 done-criterion: a FLAC transcode of a WAV
    clip drops as an audio near-dup inside curate_media; fresh FLAC
    material survives; probe gates route by the STREAMINFO frame
    count."""
    from adampro_spark.pipeline.multimodal import (
        curate_media,
        encode_flac,
        encode_wav,
        probe_media,
    )

    rng = np.random.RandomState(159)
    a = (rng.standard_normal(6400) * 8000).astype(np.int16)
    clicked = a.copy()
    clicked[50:53] += 400
    fresh = (rng.standard_normal(6400) * 8000).astype(np.int16)
    rows = [
        (0, encode_wav(a)),                       # keeper
        (1, encode_flac(clicked)),                # transcoded click copy -> drop
        (2, encode_flac(fresh)),                  # fresh flac -> keep
        (3, encode_flac(np.full(30, 5, np.int16))),  # under envelope grid
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    pr = {r["media_id"]: (r["format"], r["n_frames"], r["sample_rate"])
          for r in probe_media(df).collect()}
    assert pr[1][0] == "flac" and pr[1][1] == 6400 and pr[1][2] == 16000
    assert pr[3][1] == 30
    out, report = curate_media(df)
    assert {r["media_id"] for r in out.collect()} == {0, 2, 3}
    assert report["n_neardup_dropped_audio"] == 1
    assert report["n_undecodable"] == 0


# ---------------------------------------------------------------------------
# WebP lossless (VP8L) decode (verdict r14 #1)
# ---------------------------------------------------------------------------

def _vp8l_canonical(lengths):
    """Canonical (code, len) per symbol — the test-side mirror of
    _PrefixCode's assignment, for hand-writing streams."""
    used = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    maxlen = max(ln for ln, _ in used)
    bl = [0] * (maxlen + 1)
    for ln, _ in used:
        bl[ln] += 1
    code = 0
    nxt = [0] * (maxlen + 2)
    for ln in range(1, maxlen + 1):
        code = (code + bl[ln - 1]) << 1
        nxt[ln] = code
    out = {}
    for ln, sym in used:
        out[sym] = (nxt[ln], ln)
        nxt[ln] += 1
    return out


def _write_lengths_code(wr, lengths):
    """Emit a NORMAL prefix code whose code-length code is the complete
    16×4-bit literal code (CL symbols 0-15 at length 4): every symbol's
    length is written explicitly, no run coding."""
    from adampro_spark.pipeline.multimodal import _VP8L_CL_ORDER

    assert all(0 <= ln <= 15 for ln in lengths)
    wr.u(0, 1)          # normal
    wr.u(19 - 4, 4)     # all 19 CL entries transmitted
    for sym in _VP8L_CL_ORDER:
        wr.u(4 if sym <= 15 else 0, 3)
    wr.u(0, 1)          # no limited-symbol-count header
    for ln in lengths:
        wr.code(ln, 4)  # CL canonical: symbol v ↔ code v at 4 bits
    return _vp8l_canonical(lengths)


def _single(wr, sym):
    from adampro_spark.pipeline.multimodal import _vp8l_write_single

    _vp8l_write_single(wr, sym)


def _vp8l_blob(body_bits):
    """Wrap written VP8L bits (after the w/h/alpha/version header,
    which the caller includes) in a RIFF/WEBP container."""
    payload = b"\x2f" + body_bits.bytes()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_vp8l_round_trips_and_probe():
    """encode_webp → decode_webp exact across literal, subtract-green
    and all 14 predictor modes; media_probe reads the VP8L dims."""
    from adampro_spark.pipeline.multimodal import (
        decode_webp,
        encode_webp,
        media_probe,
    )

    rng = np.random.RandomState(160)
    c = rng.randint(0, 256, (17, 21, 3), np.int64).astype(np.uint8)
    g = rng.randint(0, 256, (19, 23), np.int64).astype(np.uint8)
    blob = encode_webp(c)
    assert media_probe(blob) == {
        "format": "webp", "width": 21, "height": 17, "n_frames": 1,
        "sample_rate": None,
    }
    assert np.array_equal(decode_webp(blob, rgb=True), c)
    assert np.array_equal(decode_webp(encode_webp(c, subtract_green=True), rgb=True), c)
    for m in range(14):
        assert np.array_equal(
            decode_webp(encode_webp(c, predictor_mode=m), rgb=True), c
        ), m
    luma = decode_webp(encode_webp(g))
    assert np.array_equal(luma, g)




def _complete4(symbols, alphabet):
    """Length table: every needed symbol at 4 bits, padded with unused
    low symbols to EXACTLY 16 used entries (a complete 4-bit code)."""
    need = sorted(set(symbols))
    assert len(need) <= 16
    lens = [0] * alphabet
    for sym in need:
        lens[sym] = 4
    used = len(need)
    for sym in range(alphabet):
        if used == 16:
            break
        if lens[sym] == 0:
            lens[sym] = 4
            used += 1
    assert used == 16
    return lens


def test_vp8l_lz77_and_color_cache_hand_built():
    """Hand-assembled stream: a literal row, two length-8 backrefs at a
    DIRECT distance (prefix 13 + 5 extras → 128 → dist 8), a color
    cache hit, then a NEAR-MAP backref (symbol 0 → (0,1) → dist = w) —
    pixel semantics pinned by simulation here, not the library
    encoder."""
    from adampro_spark.pipeline.multimodal import _Vp8lWriter, decode_webp

    w, h = 8, 4
    row = [(255, i * 30 % 256, (i * 7 + 3) % 256, (i * 11) % 256)
           for i in range(w)]  # (a, r, g, b)
    cache_bits = 4
    px = [(a << 24) | (r << 16) | (g << 8) | b for (a, r, g, b) in row]
    cache_state = {}
    for p in px * 3:  # row 0 literals + two copied rows, in order
        cache_state[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p
    tgt = (0x1E35A7BD * px[3] & 0xFFFFFFFF) >> (32 - cache_bits)
    hit_val = cache_state[tgt]

    length_sym = 256 + 5            # prefix 5: 6 + u(1) + 1 → 7 or 8
    cache_sym = 256 + 24 + tgt
    galpha = 256 + 24 + (1 << cache_bits)

    wr = _Vp8lWriter()
    wr.u(w - 1, 14)
    wr.u(h - 1, 14)
    wr.u(0, 1)
    wr.u(0, 3)
    wr.u(0, 1)                      # no transforms
    wr.u(1, 1)                      # color cache
    wr.u(cache_bits, 4)
    wr.u(0, 1)                      # no meta prefix
    gmap = _write_lengths_code(
        wr, _complete4([g for (_, _, g, _) in row] + [length_sym, cache_sym],
                       galpha))
    rmap = _write_lengths_code(wr, _complete4([r for (_, r, _, _) in row], 256))
    bmap = _write_lengths_code(wr, _complete4([b for (_, _, _, b) in row], 256))
    _single(wr, 255)                # alpha
    dmap = _write_lengths_code(wr, _complete4([0, 13], 40))

    for (_, r, g, b) in row:        # row 0 literals
        wr.code(*gmap[g])
        wr.code(*rmap[r])
        wr.code(*bmap[b])
    for _ in range(2):              # rows 1-2: direct-distance copies
        wr.code(*gmap[length_sym])
        wr.u(1, 1)                  # length extra → 8
        wr.code(*dmap[13])
        wr.u(31, 5)                 # 96 + 31 + 1 = 128 → dist 8
    wr.code(*gmap[cache_sym])       # row 3 pixel 0: cache hit
    wr.code(*gmap[length_sym])      # rest of row 3: near-map backref
    wr.u(0, 1)                      # length extra → 7
    wr.code(*dmap[0])               # prefix value 1 → map (0,1) → dist 8

    got = decode_webp(_vp8l_blob(wr), rgb=True)
    want = np.array([[(r, g, b) for (_, r, g, b) in row]] * 4, dtype=np.uint8)
    ha, hr, hg, hb = ((hit_val >> s) & 0xFF for s in (24, 16, 8, 0))
    want[3, 0] = (hr, hg, hb)
    want[3, 1:] = [  # near backref copies row 2 cols 1.. (dist 8)
        (r, g, b) for (_, r, g, b) in row
    ][1:]
    assert np.array_equal(got, want)


def test_vp8l_palette_bundling_hand_built():
    """Color-indexing transform with sub-byte bundling: 4-entry
    palette → 2-bit indices, 4 per packed byte; delta-coded palette
    entries; trailing pad bits in the last packed byte ignored."""
    from adampro_spark.pipeline.multimodal import _Vp8lWriter, decode_webp

    w, h = 10, 3
    pal = [(255, 20, 40, 60), (255, 200, 10, 90), (255, 0, 0, 0),
           (255, 130, 250, 5)]
    idx = [[(x * 3 + y) % 4 for x in range(w)] for y in range(h)]

    wr = _Vp8lWriter()
    wr.u(w - 1, 14)
    wr.u(h - 1, 14)
    wr.u(0, 1)
    wr.u(0, 3)
    wr.u(1, 1)                      # a transform
    wr.u(3, 2)                      # color indexing
    wr.u(len(pal) - 1, 8)
    # palette subimage (psize × 1): DELTA-coded entries as literals
    deltas = []
    prev = (0, 0, 0, 0)
    for p in pal:
        deltas.append(tuple((c - q) % 256 for c, q in zip(p, prev)))
        prev = p
    wr.u(0, 1)                      # no cache in subimage
    gmapp = _write_lengths_code(wr, _complete4([d[2] for d in deltas], 280))
    rmapp = _write_lengths_code(wr, _complete4([d[1] for d in deltas], 256))
    bmapp = _write_lengths_code(wr, _complete4([d[3] for d in deltas], 256))
    amapp = _write_lengths_code(wr, _complete4([d[0] for d in deltas], 256))
    _single(wr, 0)                  # distance
    for (da, dr, dg, db) in deltas:
        wr.code(*gmapp[dg])
        wr.code(*rmapp[dr])
        wr.code(*bmapp[db])
        wr.code(*amapp[da])
    wr.u(0, 1)                      # no more transforms
    # main image at PACKED width ceil(10/4) = 3
    packed = []
    for y in range(h):
        rowb = []
        for x0 in range(0, w, 4):
            b = 0
            for j, x in enumerate(range(x0, min(x0 + 4, w))):
                b |= idx[y][x] << (2 * j)
            rowb.append(b)
        packed.append(rowb)
    wr.u(0, 1)                      # no cache
    wr.u(0, 1)                      # no meta
    gvals = sorted({b for rowb in packed for b in rowb})
    gmap = _write_lengths_code(wr, _complete4(gvals, 280))
    _single(wr, 0)                  # red
    _single(wr, 0)                  # blue
    _single(wr, 255)                # alpha
    _single(wr, 0)                  # distance
    for rowb in packed:
        for b in rowb:
            wr.code(*gmap[b])

    got = decode_webp(_vp8l_blob(wr), rgb=True)
    want = np.array(
        [[pal[idx[y][x]][1:] for x in range(w)] for y in range(h)],
        dtype=np.uint8,
    )
    assert np.array_equal(got, want)


def test_vp8l_color_transform_hand_built():
    """Color transform: one whole-image block with fixed multipliers;
    residuals forward-computed here, inverse must recover the
    original."""
    from adampro_spark.pipeline.multimodal import (
        _Vp8lWriter,
        _ctd,
        decode_webp,
    )

    rng = np.random.RandomState(161)
    w, h = 8, 4
    orig = rng.randint(0, 256, (h, w, 3))
    g2r, g2b, r2b = 0x30, 0xE8, 0x10
    res = np.zeros_like(orig)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in orig[y, x])
            rr = (r - _ctd(g2r, g)) % 256
            bb = (b - _ctd(g2b, g) - _ctd(r2b, r)) % 256
            res[y, x] = (rr, g, bb)

    wr = _Vp8lWriter()
    wr.u(w - 1, 14)
    wr.u(h - 1, 14)
    wr.u(0, 1)
    wr.u(0, 3)
    wr.u(1, 1)
    wr.u(1, 2)                      # color transform
    size_bits = 3                   # 8x8 block covers the image
    wr.u(size_bits - 2, 3)
    wr.u(0, 1)                      # subimage: no cache
    _single(wr, g2b)                # green channel ← green_to_blue
    _single(wr, r2b)                # red channel ← red_to_blue
    _single(wr, g2r)                # blue channel ← green_to_red
    _single(wr, 255)                # alpha
    _single(wr, 0)                  # distance
    wr.u(0, 1)                      # no more transforms
    wr.u(0, 1)                      # no cache
    wr.u(0, 1)                      # no meta
    from adampro_spark.pipeline.multimodal import _vp8l_write_flat_code

    gmap = _vp8l_write_flat_code(wr, 280)
    rmap = _vp8l_write_flat_code(wr, 256)
    bmap = _vp8l_write_flat_code(wr, 256)
    _single(wr, 255)
    _single(wr, 0)
    for y in range(h):
        for x in range(w):
            rr, g, bb = (int(v) for v in res[y, x])
            wr.code(*gmap[g])
            wr.code(*rmap[rr])
            wr.code(*bmap[bb])

    got = decode_webp(_vp8l_blob(wr), rgb=True)
    assert np.array_equal(got, orig.astype(np.uint8))


def test_vp8l_meta_prefix_groups_hand_built():
    """Meta prefix groups: a 2×2 meta image routes 4×4 blocks to two
    all-single-symbol groups — block color pattern must follow the
    meta routing."""
    from adampro_spark.pipeline.multimodal import _Vp8lWriter, decode_webp

    w = h = 8
    meta_bits = 2
    meta = [[0, 1], [1, 0]]
    colors = [(10, 20, 30), (40, 50, 60)]  # (g, r, b) per group

    wr = _Vp8lWriter()
    wr.u(w - 1, 14)
    wr.u(h - 1, 14)
    wr.u(0, 1)
    wr.u(0, 3)
    wr.u(0, 1)                      # no transforms
    wr.u(0, 1)                      # no cache
    wr.u(1, 1)                      # meta prefix present
    wr.u(meta_bits - 2, 3)
    # meta subimage 2×2: green = group id via a 2-symbol simple code
    wr.u(0, 1)                      # subimage: no cache
    wr.u(1, 1)                      # simple green code
    wr.u(1, 1)                      # two symbols
    wr.u(0, 1)                      # 1-bit first symbol
    wr.u(0, 1)                      # symbol 0
    wr.u(1, 8)                      # symbol 1
    _single(wr, 0)                  # red
    _single(wr, 0)                  # blue
    _single(wr, 255)                # alpha
    _single(wr, 0)                  # distance
    # canonical 1-bit codes: symbol 0 → 0, symbol 1 → 1
    for rowm in meta:
        for v in rowm:
            wr.u(v, 1)
    # two groups, all single-symbol codes (zero data bits per pixel)
    for (g, r, b) in colors:
        _single(wr, g)
        _single(wr, r)
        _single(wr, b)
        _single(wr, 255)
        _single(wr, 0)
    # pixel loop reads zero bits — nothing more to write

    got = decode_webp(_vp8l_blob(wr), rgb=True)
    want = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            g, r, b = colors[meta[y >> meta_bits][x >> meta_bits]]
            want[y, x] = (r, g, b)
    assert np.array_equal(got, want)


def test_webp_containers_and_curate_media_integration(spark):
    """The verdict-r14 #1 done-criteria: a VP8L re-encode of a BMP twin
    near-dups inside curate_media; the external LOSSY fixture (CPython
    test data, VP8X+ALPH+VP8) probes dims but decodes to an honest
    NULL, counted n_undecodable."""
    import os

    from adampro_spark.pipeline.multimodal import (
        curate_media,
        decode_webp,
        encode_bmp,
        encode_webp,
        media_probe,
    )

    lossy = open(
        os.path.join(os.path.dirname(__file__), "resources", "webp",
                     "lossy_vp8x.webp"), "rb",
    ).read()
    pr = media_probe(lossy)
    assert pr["format"] == "webp" and pr["width"] >= 9 and pr["height"] >= 8
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(lossy)

    rng = np.random.RandomState(162)
    img = rng.randint(0, 256, (24, 24), np.int64).astype(np.uint8)
    fresh = rng.randint(0, 256, (24, 24), np.int64).astype(np.uint8)
    rows = [
        (0, encode_bmp(img)),                     # keeper
        (1, encode_webp(img, subtract_green=True)),  # VP8L twin -> drop
        (2, encode_webp(fresh)),                  # fresh VP8L -> keep
        (3, lossy),                               # lossy: NULL, passes
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out, report = curate_media(df)
    assert {r["media_id"] for r in out.collect()} == {0, 2, 3}
    assert report["n_neardup_dropped_image"] == 1
    assert report["n_undecodable"] == 1
    assert report["n_bad_format"] == 0
