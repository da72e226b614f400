"""Round-15 OPTIMIZATION internals (the r15 perf round).

The optimizations must not change what any operator computes; these
tests pin the equivalences the restructures rely on:

  * ``fingerprint_pairs(group_cols=...)`` — one group-keyed call equals
    the union of per-group calls (curate_media's modality merge);
  * ``_media_stats`` — the single-pass kernel reproduces the per-kernel
    probe / sha / modality-hash facts the pre-r15 multi-pass shape
    computed (probe_media + F.sha2 + image/audio/video dhash kernels).
"""

from __future__ import annotations

import numpy as np
import pytest


def _pairs_set(df):
    return {(r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()}


def test_fingerprint_pairs_group_cols_equals_per_group_union(spark):
    from adampro_spark.pipeline.dedup import fingerprint_pairs

    # two groups; hashes collide ACROSS groups on purpose (identical
    # values in both groups) — group_cols must keep them apart
    rows = [
        # group g1: a tight family {1,2} (hamming 1) + a loner
        (1, 0b1010101, "g1"),
        (2, 0b1010100, "g1"),
        (3, 0b1111111111111111111, "g1"),
        # group g2: same fingerprints as g1's family — must NOT pair
        # with g1 rows despite identical band keys
        (4, 0b1010101, "g2"),
        (5, 0b1010100, "g2"),
        (6, 0b1010101, "g2"),  # exact dup inside g2
        (7, None, "g2"),  # NULL fingerprint: never pairs
    ]
    df = spark.createDataFrame(rows, "doc_id long, fp long, g string")

    merged = _pairs_set(
        fingerprint_pairs(
            df, "fp", pk="doc_id", max_hamming=2, nbits=63,
            group_cols=("g",),
        )
    )
    per_group = set()
    for g in ("g1", "g2"):
        per_group |= _pairs_set(
            fingerprint_pairs(
                df.filter(f"g = '{g}'"), "fp", pk="doc_id",
                max_hamming=2, nbits=63,
            )
        )
    assert merged == per_group
    # sanity: the intended pairs exist and never cross groups
    ids = {(a, b) for a, b, _ in merged}
    assert (1, 2) in ids and (4, 5) in ids and (4, 6) in ids
    assert not any(a <= 3 < b for a, b in ids)


def test_media_stats_matches_per_kernel_facts(spark):
    """The single-pass _media_stats table agrees with the standalone
    kernels it replaced, per blob: probe fields, sha256 prefix, byte
    length, modality routing and perceptual hash — incl. an animated
    gif (video), a too-small image (no modality), junk (gate fail) and
    an undecodable eligible blob (NULL hash, modality kept)."""
    import hashlib

    from pyspark.sql import functions as F

    from adampro_spark.pipeline.multimodal import (
        _media_stats,
        audio_envelope_bits,
        decode_media,
        dhash_bits,
        encode_bmp,
        encode_gif,
        encode_wav,
        media_probe,
        _modality_hash,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    img2 = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    wav = encode_wav(
        (np.sin(np.arange(9600) / 40.0) * 8000).astype(np.int16)
    )
    blobs = {
        10: encode_bmp(img),                      # image
        11: encode_gif([img, img2]),              # animated gif -> video
        12: wav,                                  # audio
        13: encode_bmp(img[:4, :4]),              # below dhash grid
        14: b"junkjunkjunk",                      # unknown -> gate fail
        15: encode_bmp(img)[:40],                 # header ok, pixels truncated
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()],
        "media_id long, content binary",
    )
    stats = {
        r["media_id"]: r.asDict()
        for r in _media_stats(
            df, "content", "media_id", None, None, None,
            want_sha=True, want_dhash=True, decoder=decode_media,
        ).collect()
    }
    for mid, blob in blobs.items():
        row = stats[mid]
        pr = media_probe(blob)
        assert row["_ap_fmt"] == pr["format"]
        assert row["_ap_w"] == pr["width"]
        assert row["_ap_h"] == pr["height"]
        assert row["_ap_nf"] == pr["n_frames"]
        assert row["n_bytes"] == len(blob)
        assert row["_fmt_ok"] == (pr["format"] != "unknown")
        if row["_fmt_ok"]:
            assert row["fp_hex"] == hashlib.sha256(blob).hexdigest()[:16]
            mod, dh = _modality_hash(
                blob, pr["format"], pr["width"], pr["height"],
                pr["n_frames"], decode_media,
            )
            assert (row["_mod"], row["dhash"]) == (mod, dh)
        else:
            assert row["fp_hex"] is None and row["_mod"] is None
    # spot-pin the routing itself
    assert stats[10]["_mod"] == "image"
    assert stats[10]["dhash"] == dhash_bits(img)
    assert stats[11]["_mod"] == "video"
    assert stats[12]["_mod"] == "audio"
    assert stats[13]["_mod"] is None  # below the 9x8 grid: never decoded
    assert stats[15]["_mod"] == "image" and stats[15]["dhash"] is None


def test_fit_dsir_column_target_equals_dataframe_target(spark):
    """The one-pass Column-target fit (round-15 optimization) produces
    the SAME bucket table and meta as the two-pass DataFrame-target fit
    when the target is a slice of the raw corpus."""
    from pyspark.sql import functions as F

    from adampro_spark.pipeline.dsir import fit_dsir

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} alpha beta w{i}") for i in range(40)],
        "doc_id long, text string",
    )
    pred = F.col("doc_id") % 10 == 0
    b1, m1 = fit_dsir(docs, docs.filter(pred), n_buckets=64)
    b2, m2 = fit_dsir(docs, pred, n_buckets=64)
    assert m1 == m2
    t1 = {r["bucket"]: r["log_ratio"] for r in b1.collect()}
    t2 = {r["bucket"]: r["log_ratio"] for r in b2.collect()}
    assert t1 == t2


def test_dsir_resample_precomputed_weights_identical(spark):
    """dsir_resample(weights=) selects exactly the rows the internal
    weights pass would — the resample key is a deterministic function
    of (pk, dsir_logweight)."""
    from pyspark.sql import functions as F

    from adampro_spark.pipeline.dsir import (
        dsir_resample, dsir_weights, fit_dsir,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{i % 11} gamma d{i}") for i in range(60)],
        "doc_id long, text string",
    )
    buckets, meta = fit_dsir(docs, F.col("doc_id") % 6 == 0, n_buckets=32)
    inline = {
        r["doc_id"]
        for r in dsir_resample(docs, buckets, meta, k=9, seed=3).collect()
    }
    wdf = dsir_weights(docs, buckets, meta)
    reused = {
        r["doc_id"]
        for r in dsir_resample(
            docs, buckets, meta, k=9, seed=3, weights=wdf
        ).collect()
    }
    assert inline == reused and len(inline) == 9


def test_dedup_drops_complements_deduplicate(spark):
    """dedup_drops (round-15 factoring) is exactly the complement of
    deduplicate's survivors, for both survivor policies — so counting
    the slim drop-list equals counting the removed corpus rows."""
    from pyspark.sql import functions as F

    from adampro_spark.pipeline.dedup import dedup_drops, deduplicate

    df = spark.createDataFrame(
        [(i, (i % 4) * 10) for i in range(12)], "doc_id long, q long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (7, 9), (3, 11)], "id_a long, id_b long"
    )
    ids = {r["doc_id"] for r in df.select("doc_id").collect()}
    for kw in ({}, {"keep_by": "q", "keep": "max"}):
        kept = {
            r["doc_id"]
            for r in deduplicate(df, pairs, pk="doc_id", **kw).collect()
        }
        drops = {
            r["doc_id"]
            for r in dedup_drops(df, pairs, pk="doc_id", **kw).collect()
        }
        assert kept == ids - drops
        assert drops and drops.issubset(ids)
