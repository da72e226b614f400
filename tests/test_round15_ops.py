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
