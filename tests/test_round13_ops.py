"""Round-13 regressions: the four ADVICE items (r12) — assign_sessions
under num_partitions<=1, the ecp_radius metric gate vs buildable
distances, JPEG fill-byte / standalone-marker header walks, and the
radius_scan limit-forces-ordering contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_assign_sessions_single_partition_carry(spark):
    """ADVICE r12 (medium): num_partitions=1 used to hand approxQuantile
    an EMPTY probability list (raw Py4J NPE) whenever a hot key routed
    through the carry.  One bucket is a legal degenerate carry — results
    must match the plain-window labeling exactly."""
    from adampro_spark.streaming.ingest import assign_sessions

    rows = [
        ("bot", f"e{i:03d}", f"2024-01-01 00:{i:02d}:00") for i in range(40)
    ] + [("u1", "x1", "2024-01-01 09:00:00"), ("u1", "x2", "2024-01-01 10:00:00")]
    ev = spark.createDataFrame(
        rows, "user_id string, event_id string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = {
        (r["event_id"], r["session_idx"])
        for r in assign_sessions(
            ev, gap="5 minutes", skew_threshold=None
        ).collect()
    }
    got = {
        (r["event_id"], r["session_idx"])
        for r in assign_sessions(
            ev, gap="5 minutes", skew_threshold=10, num_partitions=1
        ).collect()
    }
    assert got == want


def test_ecp_metric_gate_matches_buildable_set(spark):
    """ADVICE r12 (low): METRIC_DISTANCES must only list distances an
    eCP index can actually be BUILT with — a chebyshev/haversine meta
    used to pass the metric gate then die in np_distance with a
    confusing 'unsupported reference distance'."""
    from adampro_spark.index.ecp import METRIC_DISTANCES, ecp_radius

    assert METRIC_DISTANCES == frozenset({"euclidean", "manhattan"})
    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    for dn in ("chebyshev", "minkowski", "haversine", "cosine"):
        fake_meta = {"distance": dn, "leaders": [[0.0, 0.0]], "pk": "vec_id"}
        with pytest.raises(NotImplementedError, match="radius_scan"):
            ecp_radius(df, "embedding", df, fake_meta, [0.0, 0.0], 1.0)


def test_jpeg_header_walk_fill_and_standalone_markers():
    """ADVICE r12 (low): legal 0xFF fill bytes before a marker
    (T.81 B.1.1.2) and standalone TEM (0xFF01) markers in the header
    stream must not desynchronize the segment walk."""
    from adampro_spark.pipeline.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    buf = encode_jpeg(img, quant=1)
    base = decode_jpeg(buf)

    # inject fill bytes before the DQT marker and a TEM right after SOI
    dqt = buf.index(b"\xff\xdb")
    mangled = (
        buf[:2] + b"\xff\x01" + buf[2:dqt] + b"\xff\xff\xff" + buf[dqt + 1 :]
    )
    out = decode_jpeg(mangled)
    assert (out == base).all()

    # a stuffed-zero pseudo-marker in header position is still rejected
    with pytest.raises(ValueError, match="marker"):
        decode_jpeg(buf[:2] + b"\xff\x00" + buf[2:])

    # a stream ENDING in fill bytes raises the contract ValueError, not
    # a raw IndexError (review r13, confirmed crash)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b"\xff\xd8\xff\xff")


def test_radius_scan_limit_forces_ordering(spark):
    """The documented contract: limit= always returns the CLOSEST rows
    even with ordered=False (an unordered limit would be an arbitrary
    plan-dependent subset)."""
    from adampro_spark.operators.scan import radius_scan

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(50)],
        "ap_id long, vec array<double>",
    ).repartition(8)
    got = [
        r["ap_id"]
        for r in radius_scan(
            df, "vec", [0.0, 0.0], 100.0, limit=5, ordered=False
        ).collect()
    ]
    assert got == [0, 1, 2, 3, 4]


# ---------------------------------------------------------------------------
# JPEG external-encoder interop + chroma/RGB decode (verdict r12 #1)
# ---------------------------------------------------------------------------

_JFIX = __import__("os").path.join(__import__("os").path.dirname(__file__), "resources", "jpeg")


def _fix(name):
    import os

    with open(os.path.join(_JFIX, name), "rb") as f:
        return f.read()


def _truth(key):
    import os

    return np.load(os.path.join(_JFIX, "imageio_truth.npz"))[key]


def test_jpeg_external_encoder_interop_luma():
    """Fixtures encoded by INDEPENDENT encoders (JDK ImageIO / the
    encoders behind the IPython+CPython test images) must decode to the
    independent JDK-ImageIO raster truth — self-round-trips cannot catch
    a self-consistent spec misreading (verdict r12 #1)."""
    from adampro_spark.pipeline.multimodal import decode_jpeg

    for jpg, key, tol in (
        ("flat.jpg", "flat_luma", 0),
        ("grad.jpg", "grad_luma", 2),
        ("ipython_2x2.jpg", "ipython_2x2_luma", 0),
    ):
        out = decode_jpeg(_fix(jpg))
        want = _truth(key)
        assert out.shape == want.shape, jpg
        d = int(np.abs(out.astype(int) - want.astype(int)).max())
        assert d <= tol, (jpg, d)


def test_jpeg_external_encoder_interop_rgb():
    """rgb=True: chroma IDCT + libjpeg-convention fancy 4:2:0 upsample +
    BT.601 must match JDK ImageIO's RGB within ±2 on externally-encoded
    color files."""
    from adampro_spark.pipeline.multimodal import decode_jpeg

    for jpg, key in (
        ("color.jpg", "color_rgb"),
        ("cpython_logo.jpg", "cpython_logo_rgb"),
    ):
        buf = _fix(jpg)
        out = decode_jpeg(buf, rgb=True)
        want = _truth(key)
        assert out.shape == want.shape, jpg
        d = int(np.abs(out.astype(int) - want.astype(int)).max())
        assert d <= 2, (jpg, d)
    # the color fixture must keep exercising 4:2:0 (SOF0 luma factors 2x2)
    buf = _fix("color.jpg")
    sof = buf.index(b"\xff\xc0")
    assert buf[sof + 9] == 3  # 3 components
    assert buf[sof + 11] == 0x22  # component 1 h<<4|v = 2,2


def test_jpeg_rgb_roundtrip_and_gray_replication():
    """encode_jpeg(RGB) → decode_jpeg(rgb=True) reproduces the source on
    4:4:4 near-lossless; a grayscale stream replicates luma ×3; the
    default luma path is unchanged by the rgb plumbing."""
    from adampro_spark.pipeline.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(23)
    rgb = rng.randint(0, 256, size=(19, 13, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quant=1), rgb=True)
    assert out.shape == (19, 13, 3)
    assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 3

    gray = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    buf = encode_jpeg(gray, quant=1)
    rep = decode_jpeg(buf, rgb=True)
    luma = decode_jpeg(buf)
    assert rep.shape == (16, 16, 3)
    assert (rep == luma[:, :, None]).all()


# ---------------------------------------------------------------------------
# Language-routed stop-word gating (verdict r12 #2)
# ---------------------------------------------------------------------------

_FR_DOC = (
    "le chat est dans la maison et les enfants jouent pour un moment "
    "dans le jardin avec une balle et des amis sous le soleil du matin "
    "puis ils rentrent pour manger et lire un livre dans la cuisine "
    "avec leur mere et leur pere qui preparent le repas du soir pour "
    "tout le monde et pour les voisins qui arrivent dans une heure"
)


def test_stopword_gate_routes_on_language(spark):
    """A French document must stop failing the English-keyed stop-word
    surfaces: routed stopword_ratio reads the French list, and the
    routed Gopher _g_required rule checks French common words."""
    from adampro_spark.pipeline.curate import gopher_gate_flags
    from adampro_spark.pipeline.text import langid_expr, text_stats, tokens_expr

    df = spark.createDataFrame(
        [(1, _FR_DOC), (2, "the cat and the dog are in the house of a "
                           "friend and it is for the best to stay on in")],
        "doc_id long, text string",
    )
    plain = {r["doc_id"]: r["stopword_ratio"]
             for r in text_stats(df).collect()}
    routed = {r["doc_id"]: r["stopword_ratio"]
              for r in text_stats(df, lang_col="auto").collect()}
    # English doc: identical under routing; French doc: near-zero ratio
    # against the English list, healthy against its own
    assert routed[2] == plain[2]
    assert plain[1] < 0.05
    assert routed[1] > 0.2

    staged = df.withColumn("_tk", tokens_expr("text")).withColumn(
        "_lg", langid_expr("text", toks=F.col("_tk"))
    )
    unrouted = staged.select(
        "doc_id",
        gopher_gate_flags(toks=F.col("_tk"), min_words=10)["_g_required"]
        .alias("req"),
    )
    routedf = staged.select(
        "doc_id",
        gopher_gate_flags(
            toks=F.col("_tk"), min_words=10, lang_col=F.col("_lg")
        )["_g_required"].alias("req"),
    )
    u = {r["doc_id"]: r["req"] for r in unrouted.collect()}
    v = {r["doc_id"]: r["req"] for r in routedf.collect()}
    assert u[1] is False and v[1] is True  # the spurious failure, fixed
    assert u[2] is True and v[2] is True   # English unchanged


def test_lang_stopwords_expr_fallback(spark):
    """Unknown/und/NULL language codes fall back to the English list."""
    from adampro_spark.pipeline.text import lang_stopwords_expr

    df = spark.createDataFrame(
        [("fr",), ("und",), (None,), ("xx",)], "lang string"
    ).select(lang_stopwords_expr(F.col("lang")).alias("sw"))
    rows = [r["sw"] for r in df.collect()]
    assert rows[0][0] == "le"
    assert rows[1][0] == rows[2][0] == rows[3][0] == "the"


# ---------------------------------------------------------------------------
# Assert-folded session-size guard (verdict r12 #3)
# ---------------------------------------------------------------------------

def _bot_events(spark, n_bot=30):
    rows = [
        ("bot", f"b{i:03d}", f"2024-01-01 00:{i:02d}:00", "view")
        for i in range(n_bot)  # 1-minute cadence, gap 5m -> ONE session
    ] + [
        ("u1", "x1", "2024-01-01 09:00:00", "view"),
        ("u1", "x2", "2024-01-01 09:02:00", "cart"),
    ]
    return spark.createDataFrame(
        rows, "user_id string, event_id string, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_session_size_guard_raises_loudly(spark):
    """A planted no-gap mega-session must raise NAMING the cap in both
    session folds; normal sessions under the cap are unaffected."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from adampro_spark.streaming.ingest import session_funnel, sessionize_events

    ev = _bot_events(spark)
    with pytest.raises(SparkRuntimeException, match="max_events_per_session=10"):
        sessionize_events(
            ev, gap="5 minutes", value_col=None, max_events_per_session=10
        ).collect()
    with pytest.raises(SparkRuntimeException, match="max_events_per_session=10"):
        session_funnel(
            ev, steps=["view", "cart"], gap="5 minutes",
            max_events_per_session=10,
        ).collect()

    # a cap above the largest session changes nothing
    base = sessionize_events(ev, gap="5 minutes", value_col=None).collect()
    capped = sessionize_events(
        ev, gap="5 minutes", value_col=None, max_events_per_session=100
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, capped))
    f0 = session_funnel(ev, steps=["view", "cart"], gap="5 minutes").collect()
    f1 = session_funnel(
        ev, steps=["view", "cart"], gap="5 minutes",
        max_events_per_session=100,
    ).collect()
    assert sorted(map(tuple, f0)) == sorted(map(tuple, f1))


# ---------------------------------------------------------------------------
# Count-then-route decontamination broadcast (verdict r12 #4)
# ---------------------------------------------------------------------------

def test_decontaminate_routes_broadcast_by_gram_count(spark):
    """Below the threshold the eval grams broadcast (today's plan);
    above it the semi join degrades to a shuffle with a warning — same
    survivors either way."""
    import warnings

    from adampro_spark.pipeline.mix import decontaminate

    train = spark.createDataFrame(
        [(i, f"tok{i} " + " ".join(f"w{j}" for j in range(6))) for i in range(30)],
        "doc_id long, text string",
    )
    # eval shares the 6-token tail -> with n=5 every train doc matches
    ev = spark.createDataFrame(
        [(0, " ".join(f"w{j}" for j in range(6)))], "eid long, text string"
    )
    kept_b = decontaminate(train, ev, n=5).select("doc_id")
    plan_b = kept_b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # the count-then-route runs at call time, inside the context
        kept_s = decontaminate(train, ev, n=5, max_broadcast_grams=0)
        plan_s = kept_s._jdf.queryExecution().executedPlan().toString()
        got_s = {r["doc_id"] for r in kept_s.collect()}
    assert any("bloom" in str(x.message) for x in w)
    # the routed semi join itself must not be a broadcast join
    semi_section = [ln for ln in plan_s.splitlines() if "LeftSemi" in ln]
    assert semi_section and all(
        "Broadcast" not in ln for ln in semi_section
    ), semi_section
    got_b = {r["doc_id"] for r in kept_b.collect()}
    assert got_b == got_s == set()  # every doc contaminated here

    # a clean corpus survives identically through both routes
    clean = spark.createDataFrame(
        [(i, " ".join(f"u{i}x{j}" for j in range(8))) for i in range(10)],
        "doc_id long, text string",
    )
    a = {r["doc_id"] for r in decontaminate(clean, ev, n=5).collect()}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        b = {r["doc_id"] for r in decontaminate(
            clean, ev, n=5, max_broadcast_grams=0).collect()}
    assert a == b == set(range(10))


def test_contamination_report_routes_too(spark):
    """The report's semi path routes on the same threshold with equal
    counts."""
    import warnings

    from adampro_spark.pipeline.mix import contamination_report

    train = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k l m n")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(0, "a b c d e")], "eid long, text string")
    base = {(r["doc_id"], r["n_grams"], r["n_matched"])
            for r in contamination_report(train, ev, n=5).collect()}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        routed = {(r["doc_id"], r["n_grams"], r["n_matched"])
                  for r in contamination_report(
                      train, ev, n=5, max_broadcast_grams=0).collect()}
    assert base == routed
    assert (1, 3, 1) in base and (2, 3, 0) in base


# ---------------------------------------------------------------------------
# keep_by for embedding/semantic dedup (verdict r12 #5)
# ---------------------------------------------------------------------------

def test_semantic_and_embedding_dedup_keep_by(spark):
    """Quality-aware survivor selection through the semantic and
    embedding facades: keep_by picks the best-scoring family member
    where min-pk would keep the smallest id."""
    from adampro_spark.pipeline.dedup import embedding_dedup, semantic_dedup

    # orthogonal one-hot directions: only planted copies are near-dups
    base = [
        (i, [1.0 if j == i else 0.0 for j in range(40)], 1.0)
        for i in range(40)
    ]
    # planted copies: same direction, higher quality score, HIGHER id
    copies = [
        (100 + i, [x * 1.5 for x in v], 9.0) for i, v, _ in base if i % 4 == 0
    ]
    df = spark.createDataFrame(
        base + copies, "vec_id long, embedding array<double>, score double"
    )
    for fn, kw in (
        (semantic_dedup, {"threshold": 0.999999}),
        (embedding_dedup, {"threshold": 0.999999}),
    ):
        minpk = {r["vec_id"] for r in fn(df, **kw).collect()}
        best = {r["vec_id"] for r in fn(df, keep_by="score", **kw).collect()}
        for i in range(0, 40, 4):
            assert i in minpk and (100 + i) not in minpk, (fn.__name__, i)
            assert (100 + i) in best and i not in best, (fn.__name__, i)
        singles = {i for i in range(40) if i % 4 != 0}
        assert singles <= minpk and singles <= best


# ---------------------------------------------------------------------------
# File-level pruning proven in the PLAN for the real query paths
# (verdict r12 #7)
# ---------------------------------------------------------------------------

def test_ecp_query_paths_prune_partitions(spark, tmp_path):
    """The 100 TB claim for the cell-partitioned eCP layout, asserted on
    the actual operators: scan_ecp (kNN candidates) and ecp_radius must
    plan their cell predicate as a Parquet PartitionFilter (file-level
    pruning), not a post-scan Filter — this also catches any accidental
    cast that would defeat pruning."""
    from adampro_spark.index.ecp import ecp_radius, scan_ecp
    from adampro_spark.operators.scan import radius_scan
    from adampro_spark.ops import AdamOps

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    o = AdamOps(spark, str(tmp_path / "cat"))
    o.index.create_from_df(
        "p_ecp", "emb", emb, "embedding", "ecp", pk="vec_id"
    )
    idx_df, meta = o.index.load("p_ecp")
    q = [0.1] * len(emb.select("embedding").first()["embedding"])

    knn_cands = scan_ecp(idx_df, meta, q, 10)
    plan = knn_cands._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters")[1][:300]
    assert "ap_indexfeature" in pf and " IN (" in pf, pf

    rad = ecp_radius(emb, "embedding", idx_df, meta, q, 3.0)
    rplan = rad._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in rplan
    # the index-scan leg of the radius plan carries the cell predicate
    scans = [
        seg for seg in rplan.split("FileScan parquet")[1:]
        if "ap_indexfeature" in seg.split("ReadSchema")[0]
    ]
    assert any(
        "ap_indexfeature" in seg.split("PartitionFilters")[1][:300]
        for seg in scans if "PartitionFilters" in seg
    ), rplan[:2000]
    # and the pruned result still equals the brute scan
    brute = {r["vec_id"] for r in radius_scan(
        emb, "embedding", q, 3.0, pk="vec_id").collect()}
    got = {r["vec_id"] for r in rad.collect()}
    assert got == brute


# ---------------------------------------------------------------------------
# eCP kNN exact cell-bound pruning (verdict r12 #8)
# ---------------------------------------------------------------------------

def test_ecp_knn_cell_bound_exact(spark):
    """cell_bound=True must equal brute force EXACTLY (the budget path
    is lossy by design), prune cells on separable corpora, and refuse
    unsound inputs honestly."""
    import numpy as np

    from adampro_spark.index.ecp import build_ecp, ecp_knn
    from adampro_spark.operators.scan import DISTANCE_COL, sequential_scan
    from adampro_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    q = [0.1] * len(emb.select("embedding").first()["embedding"])
    for dn in ("euclidean", "manhattan"):
        idx, meta = build_ecp(
            emb, "embedding", pk="vec_id", distance_name=dn, autofit=False
        )
        for k in (1, 10, 37):
            brute = [
                (r["vec_id"], round(r[DISTANCE_COL], 6))
                for r in sequential_scan(
                    emb, "embedding", q, k, dn, pk="vec_id"
                ).collect()
            ]
            got = [
                (r["vec_id"], round(r[DISTANCE_COL], 6))
                for r in ecp_knn(
                    emb, "embedding", idx, meta, q, k, cell_bound=True
                ).collect()
            ]
            assert got == brute, (dn, k)

    # pruning actually happens: two far-apart clusters, query in one
    rng = np.random.RandomState(7)
    pts = [(i, (rng.standard_normal(8) * 0.1).tolist()) for i in range(200)]
    pts += [(200 + i, (rng.standard_normal(8) * 0.1 + 50.0).tolist())
            for i in range(200)]
    sep = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    idx2, meta2 = build_ecp(
        sep, "embedding", pk="vec_id", distance_name="euclidean", autofit=False
    )
    d = np.linalg.norm(
        np.array(meta2["leaders"]) - np.zeros(8), axis=1
    )
    got = {r["vec_id"] for r in ecp_knn(
        sep, "embedding", idx2, meta2, [0.0] * 8, 5, cell_bound=True
    ).collect()}
    want = {r["vec_id"] for r in sequential_scan(
        sep, "embedding", [0.0] * 8, 5, "euclidean", pk="vec_id").collect()}
    assert got == want and got <= set(range(200))

    # honest refusals: wrong metric, legacy meta, prefilter
    with pytest.raises(NotImplementedError, match="metric"):
        ecp_knn(sep, "embedding", idx2, meta2, [0.0] * 8, 5,
                distance_name="cosine", cell_bound=True)
    legacy = {k2: v for k2, v in meta2.items() if k2 != "radii"}
    with pytest.raises(ValueError, match="radii"):
        ecp_knn(sep, "embedding", idx2, legacy, [0.0] * 8, 5, cell_bound=True)
    with pytest.raises(NotImplementedError, match="prefilter"):
        ecp_knn(sep, "embedding", idx2, meta2, [0.0] * 8, 5,
                prefilter=sep.select("vec_id"), cell_bound=True)


# ---------------------------------------------------------------------------
# Perceptual image dedup: dHash + fingerprint_pairs (round 13,
# beyond-reference)
# ---------------------------------------------------------------------------

def test_image_dhash_and_fingerprint_pairs(spark):
    """A re-encoded / lightly retouched copy keeps a near-identical
    63-bit dHash (pairs via the Manku machinery); engineered-distinct
    images (inverted / mirrored gradients, which flip the horizontal
    comparison signs) do not pair.  The same image saved as BMP and as
    JPEG must also pair — the cross-format near-dup case the byte-level
    sha fingerprint can never catch."""
    from adampro_spark.pipeline.dedup import deduplicate, fingerprint_pairs
    from adampro_spark.pipeline.multimodal import (
        dhash_bits,
        encode_bmp,
        encode_jpeg,
        image_dhash,
    )

    h, w = 36, 32
    ramp = (np.add.outer(np.arange(h) * 7, np.arange(w) * 3) % 256).astype(
        np.uint8
    )
    inverted = (255 - ramp).astype(np.uint8)
    mirrored = ramp[:, ::-1].copy()
    # distinctness premise, pinned locally before the Spark assertions
    def ham(a, b):
        return bin(dhash_bits(a) ^ dhash_bits(b)).count("1")

    assert ham(ramp, inverted) > 6 and ham(ramp, mirrored) > 6
    retouched = np.clip(
        ramp.astype(np.int16) + np.pad(
            np.full((3, 3), 9, dtype=np.int16),
            ((5, h - 8), (5, w - 8)),
        ),
        0, 255,
    ).astype(np.uint8)
    assert ham(ramp, retouched) <= 6  # may be 0: local edit vs strong ramp

    rows = [
        (0, encode_bmp(ramp)),
        (1, encode_bmp(inverted)),
        (2, encode_bmp(mirrored)),
        (100, encode_bmp(retouched)),
        (101, encode_jpeg(ramp, quant=2)),  # cross-format copy
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")

    hashed = image_dhash(df)
    got = {r["media_id"]: r["dhash"] for r in hashed.collect()}
    assert all(0 <= v < (1 << 63) for v in got.values())
    # kernel parity with the local function
    assert got[0] == dhash_bits(ramp)

    pairs = fingerprint_pairs(
        hashed, "dhash", pk="media_id", max_hamming=6, nbits=63
    )
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 100) in got_pairs and (0, 101) in got_pairs
    assert all({a, b} <= {0, 100, 101} for a, b in got_pairs), got_pairs

    survivors = {
        r["media_id"]
        for r in deduplicate(df, pairs, pk="media_id").collect()
    }
    assert survivors == {0, 1, 2}

    with pytest.raises(ValueError, match="9x8"):
        dhash_bits(np.zeros((4, 4), dtype=np.uint8))


def test_audio_dhash_near_dup(spark):
    """Level-preserving edits keep the envelope hash near-identical;
    different material does not pair; the Spark kernel matches the
    local function."""
    from adampro_spark.pipeline.dedup import fingerprint_pairs
    from adampro_spark.pipeline.multimodal import (
        audio_dhash,
        audio_envelope_bits,
        encode_wav,
    )

    t = np.arange(8000, dtype=np.int64)
    # amplitude-modulated tone: a distinctive loudness envelope
    tone = (np.sin(t / 40.0) * (2000 + 1500 * np.sin(t / 900.0))).astype(
        np.int16
    )
    clicky = tone.copy()
    clicky[4000:4010] = 30000  # short transient, one window touched
    reversed_ = tone[::-1].copy()  # envelope reversed -> many bits flip
    white = (np.random.RandomState(3).randint(-3000, 3000, 8000)).astype(
        np.int16
    )

    assert bin(
        audio_envelope_bits(tone) ^ audio_envelope_bits(reversed_)
    ).count("1") > 6

    rows = [
        (0, encode_wav(tone)),
        (1, encode_wav(reversed_)),
        (2, encode_wav(white)),
        (100, encode_wav(clicky)),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    hashed = audio_dhash(df)
    got = {r["media_id"]: r["dhash"] for r in hashed.collect()}
    assert got[0] == audio_envelope_bits(tone)
    pairs = fingerprint_pairs(
        hashed, "dhash", pk="media_id", max_hamming=4, nbits=63
    )
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 100) in got_pairs
    assert all({a, b} <= {0, 100} for a, b in got_pairs), got_pairs

    with pytest.raises(ValueError, match="64 samples"):
        audio_envelope_bits(np.zeros(10, dtype=np.int16))


def test_video_dhash_and_mjpeg_avi(spark):
    """MJPEG-AVI frame decode + mean-frame dHash: a re-encoded copy
    (coarser quant) pairs with its source; different material does not;
    container-level striding skips undecoded frames."""
    from adampro_spark.pipeline.dedup import fingerprint_pairs
    from adampro_spark.pipeline.multimodal import (
        decode_avi_frames,
        encode_avi_mjpeg,
        video_dhash,
    )

    h, w = 36, 32
    ramp = (np.add.outer(np.arange(h) * 7, np.arange(w) * 3) % 256).astype(
        np.uint8
    )
    clip_a = [np.roll(ramp, f, axis=1) for f in range(4)]
    clip_b = [255 - f for f in clip_a]  # inverted: far-apart mean frame
    rows = [
        (0, encode_avi_mjpeg(clip_a, quant=1)),
        (1, encode_avi_mjpeg(clip_b, quant=1)),
        (100, encode_avi_mjpeg(clip_a, quant=2)),  # re-encoded copy
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    hashed = video_dhash(df)
    pairs = fingerprint_pairs(
        hashed, "dhash", pk="media_id", max_hamming=6, nbits=63
    )
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got_pairs == {(0, 100)}

    # striding decodes only the sampled frames
    avi = encode_avi_mjpeg(clip_a, quant=1)
    assert len(decode_avi_frames(avi)) == 4
    sampled = decode_avi_frames(avi, every_n=3)
    assert len(sampled) == 2
    assert (sampled[1] == decode_avi_frames(avi)[3]).all()

    with pytest.raises(NotImplementedError, match="MJPEG"):
        bad = avi.replace(b"\xff\xd8", b"\x00\x00", 1)
        decode_avi_frames(bad)


def test_media_probe_header_only(spark):
    """ffprobe-lite: header-only metadata for all five formats, junk
    survives as 'unknown', and a truncated header never raises."""
    from adampro_spark.pipeline.multimodal import (
        encode_avi_mjpeg,
        encode_bmp,
        encode_jpeg,
        encode_png,
        encode_wav,
        media_probe,
        probe_media,
    )

    img = np.full((18, 21), 50, dtype=np.uint8)
    rows = [
        (0, encode_bmp(img)),
        (1, encode_jpeg(img, quant=1)),
        (2, encode_wav(np.zeros(6400, dtype=np.int16), sample_rate=8000)),
        (3, encode_avi_mjpeg([img] * 3)),
        (4, encode_png(img)),
        (5, b"not media at all"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in probe_media(df).collect()}
    assert got[0]["format"] == "bmp" and (got[0]["width"], got[0]["height"]) == (21, 18)
    assert got[1]["format"] == "jpeg" and got[1]["n_frames"] == 1
    assert got[2]["format"] == "wav" and got[2]["sample_rate"] == 8000
    assert got[2]["n_frames"] == 6400
    assert got[3]["format"] == "avi" and got[3]["n_frames"] == 3
    assert got[4]["format"] == "png" and (got[4]["width"], got[4]["height"]) == (21, 18)
    assert got[5]["format"] == "unknown" and got[5]["width"] is None

    # truncated headers: probe never raises
    for blob in (b"BM\x01", b"\xff\xd8\xff\xff", b"RIFF1234WAVE",
                 b"RIFF1234AVI "):
        out = media_probe(blob)
        assert isinstance(out["format"], str)


def test_ops_radius_indexed_facade(spark, tmp_path):
    """query.radius_indexed routes through the persisted eCP index and
    equals the brute range scan; non-eCP indexes refuse with routing."""
    from adampro_spark.operators.scan import radius_scan
    from adampro_spark.ops import AdamOps

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    o = AdamOps(spark, str(tmp_path / "cat"))
    o.index.create_from_df("ri_ecp", "emb", emb, "embedding", "ecp", pk="vec_id")
    o.index.create_from_df("ri_vaf", "emb", emb, "embedding", "vaf", pk="vec_id")
    q = [0.1] * len(emb.select("embedding").first()["embedding"])
    brute = {r["vec_id"] for r in radius_scan(
        emb, "embedding", q, 3.0, pk="vec_id").collect()}
    got = {r["vec_id"] for r in o.query.radius_indexed(
        "ri_ecp", q, 3.0, df=emb).collect()}
    assert got == brute
    with pytest.raises(ValueError, match="eCP"):
        o.query.radius_indexed("ri_vaf", q, 3.0, df=emb)


def test_png_rgb_decode_lossless():
    """decode_png(rgb=True): truecolor channels come back VERBATIM
    (PNG is lossless) across every filter type; gray replicates x3; the
    luma default is unchanged."""
    from adampro_spark.pipeline.multimodal import decode_png, encode_png

    rng = np.random.RandomState(41)
    rgb = rng.randint(0, 256, (12, 9, 3), dtype=np.uint8)
    buf = encode_png(rgb, filters=([0, 1, 2, 3, 4] * 3)[:12])
    assert (decode_png(buf, rgb=True) == rgb).all()
    luma = decode_png(buf)
    c = rgb.astype(np.uint32)
    want = (
        (299 * c[..., 0] + 587 * c[..., 1] + 114 * c[..., 2]) // 1000
    ).astype(np.uint8)
    assert (luma == want).all()
    gray = rng.randint(0, 256, (8, 8), dtype=np.uint8)
    rep = decode_png(encode_png(gray), rgb=True)
    assert rep.shape == (8, 8, 3) and (rep == gray[:, :, None]).all()


def test_fingerprint_against_images(spark):
    """Asymmetric reference dedup over image dHashes: new images within
    hamming t of ANY reference image drop; fresh material survives; the
    text simhash path (which now delegates here) is unchanged."""
    from adampro_spark.pipeline.dedup import dedup_against, fingerprint_against
    from adampro_spark.pipeline.multimodal import dhash_bits, encode_bmp, image_dhash

    h, w = 36, 32
    ramp = (np.add.outer(np.arange(h) * 7, np.arange(w) * 3) % 256).astype(np.uint8)
    inverted = (255 - ramp).astype(np.uint8)
    mirrored = ramp[:, ::-1].copy()
    ref = spark.createDataFrame(
        [(900, encode_bmp(ramp))], "media_id long, content binary"
    )
    retouched = np.clip(
        ramp.astype(np.int16) + np.pad(
            np.full((3, 3), 9, dtype=np.int16), ((5, h - 8), (5, w - 8))
        ), 0, 255,
    ).astype(np.uint8)
    new = spark.createDataFrame(
        [(1, encode_bmp(retouched)), (2, encode_bmp(inverted)),
         (3, encode_bmp(mirrored))],
        "media_id long, content binary",
    )
    kept = fingerprint_against(
        image_dhash(new), image_dhash(ref), "dhash",
        pk="media_id", max_hamming=6, nbits=63,
    )
    assert {r["media_id"] for r in kept.collect()} == {2, 3}
    matches = fingerprint_against(
        image_dhash(new), image_dhash(ref), "dhash",
        pk="media_id", max_hamming=6, nbits=63, return_matches=True,
    ).collect()
    assert [(m["new_pk"], m["ref_pk"]) for m in matches] == [(1, 900)]
    assert matches[0]["hamming"] == bin(
        dhash_bits(retouched) ^ dhash_bits(ramp)).count("1")

    # the delegating text path still drops near-dup text and keeps fresh
    refd = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog " * 4)],
        "doc_id long, text string",
    )
    newd = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 4 + "tail"),
         (2, "completely different words in every position here now")],
        "doc_id long, text string",
    )
    out = dedup_against(newd, refd, method="simhash")
    assert {r["doc_id"] for r in out.collect()} == {2}
    assert out.columns == ["doc_id", "text"]  # no fp-column leak


def test_curate_media_end_to_end(spark):
    """The media curate composition: probe gates drop junk/undersized,
    exact dedup drops byte copies, dhash drops retouched/cross-format
    copies, audio passes the image stages untouched, and the report
    accounts for every row."""
    from adampro_spark.pipeline.multimodal import (
        curate_media,
        encode_bmp,
        encode_jpeg,
        encode_wav,
    )

    h, w = 36, 32
    ramp = (np.add.outer(np.arange(h) * 7, np.arange(w) * 3) % 256).astype(np.uint8)
    inverted = (255 - ramp).astype(np.uint8)
    retouched = np.clip(
        ramp.astype(np.int16) + np.pad(
            np.full((3, 3), 9, dtype=np.int16), ((5, h - 8), (5, w - 8))
        ), 0, 255,
    ).astype(np.uint8)
    tiny = np.full((4, 4), 9, dtype=np.uint8)
    rows = [
        (0, encode_bmp(ramp)),          # keeper
        (1, encode_bmp(ramp)),          # exact byte copy -> exact drop
        (2, encode_bmp(retouched)),     # near-dup -> dhash drop
        (3, encode_jpeg(ramp, quant=2)),  # cross-format copy -> dhash drop
        (4, encode_bmp(inverted)),      # distinct image -> keeper
        (5, encode_bmp(tiny)),          # under the size floor
        (6, b"junk bytes here"),        # unknown format
        (7, encode_wav(np.zeros(6400, dtype=np.int16))),  # audio keeper
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    timings: dict = {}
    out, report = curate_media(
        df, min_width=8, min_height=8, stage_timings=timings
    )
    kept = {r["media_id"] for r in out.collect()}
    assert kept == {0, 4, 7}
    assert report == {
        "n_input": 8,
        "n_bad_format": 1,
        "n_too_small": 1,
        "n_after_gates": 6,
        "n_exact_dropped": 1,
        "n_neardup_dropped": 2,
        "n_neardup_dropped_image": 2,
        "n_neardup_dropped_audio": 0,
        "n_neardup_dropped_video": 0,
        "n_undecodable": 0,
        "n_output": 3,
    }
    assert set(timings) == {"probe_sec", "exact_sec", "neardup_sec"}
    assert out.columns == ["media_id", "content"]

    # dedup=None keeps the near-dups, format whitelist drops audio
    out2, rep2 = curate_media(df, formats=("bmp", "jpeg"), dedup=None)
    assert rep2["n_bad_format"] == 2  # junk + wav outside the whitelist
    assert {r["media_id"] for r in out2.collect()} == {0, 1, 2, 3, 4, 5}
