"""Round-16 optimization equivalence pins.

Each test pins an optimization from OPTIMIZATION_r16.md to the exact
output it must preserve — the round's contract is that no declared
query's results change, only their cost.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_ecp_bound_phase2_gate(spark):
    """Round 16 (verdict r15 #2): ecp_knn(cell_bound=True) runs its
    τ-tightening seed scan only when the build-time prunability
    estimate says the triangle bound can exclude anything — skipping is
    exactness-safe (the scan set only widens), so the top-k must be
    identical under every gate setting and equal to brute force."""
    from adampro_spark.index import ecp
    from adampro_spark.index.ecp import build_ecp, ecp_knn
    from adampro_spark.operators.scan import sequential_scan

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx, meta = build_ecp(df, "embedding", pk="vec_id")
    assert "bound_prune_frac" in meta  # the estimator rode the autofit sample
    q = [0.2] * 8
    brute = {
        (r["vec_id"], round(r["ap_distance"], 6))
        for r in sequential_scan(df, "embedding", q, 10, "euclidean", pk="vec_id").collect()
    }

    outs = {}
    for label, est in (("skip", 0.0), ("run", 1.0), ("legacy", None)):
        m = dict(meta)
        if est is None:
            m.pop("bound_prune_frac", None)
        else:
            m["bound_prune_frac"] = est
        res = ecp_knn(df, "embedding", idx, m, q, 10, cell_bound=True)
        outs[label] = {
            (r["vec_id"], round(r["ap_distance"], 6)) for r in res.collect()
        }
        if est == 0.0:
            assert ecp.LAST_BOUND_STATS["phase2"] is False
        else:
            assert ecp.LAST_BOUND_STATS["phase2"] is True
    assert outs["skip"] == outs["run"] == outs["legacy"] == brute


def test_curate_media_reject_rank_isolation(spark):
    """Round 16 (verdict r15 #3): the exact-dedup rank window now gives
    every gate-FAILED row (NULL sha) its own singleton partition instead
    of funneling all rejects of one byte length into a single
    (NULL, n_bytes) window partition.  Semantics must be unchanged:
    rejects' ``_rn`` is only ever read under a ``kept_c`` guard, so the
    report and the survivor set are identical — pinned here with many
    distinct gate-failed blobs SHARING a byte length (the skew shape)
    alongside a real exact-dup family."""
    from adampro_spark.pipeline.multimodal import curate_media, encode_bmp

    h, w = 16, 16
    img = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
    blob = encode_bmp(img)
    rows = (
        # one byte-identical family of 3 -> 2 exact drops, min-pk keeper
        [(0, blob), (1, blob), (2, blob)]
        # 6 DISTINCT unknown-format blobs, ALL the same n_bytes (37):
        # pre-fix these shared one (NULL, 37) window partition
        + [(10 + i, bytes([65 + i]) * 37) for i in range(6)]
    )
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out, report = curate_media(df, dedup="exact")
    assert {r["media_id"] for r in out.collect()} == {0}
    assert report["n_input"] == 9
    assert report["n_bad_format"] == 6
    assert report["n_after_gates"] == 3
    assert report["n_exact_dropped"] == 2
    assert report["n_output"] == 1
