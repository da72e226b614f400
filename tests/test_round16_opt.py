"""Round-16 optimization equivalence pins.

Each test pins an optimization from OPTIMIZATION_r16.md to the exact
output it must preserve — the round's contract is that no declared
query's results change, only their cost.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


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
