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
