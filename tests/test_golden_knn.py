"""Golden-file end-to-end kNN tests — the reference's core correctness
mechanism (QueryTestSuite.scala:40-108) on its own fixture
(src/test/resources/groundtruth/): 2000 rows, 10-dim vectors, Manhattan,
k=100, exact (distance, id) match with |Δ| < 1e-4.
"""

import csv
import os

import pytest
from pyspark.sql import functions as F

from adampro_spark.operators.scan import boolean_filter, sequential_scan

GT = "/root/reference/src/test/resources/groundtruth"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GT), reason="reference groundtruth fixture not available"
)


def load_fixture(spark):
    rows = []
    with open(os.path.join(GT, "data.tsv")) as f:
        rd = csv.DictReader(f, delimiter="\t")
        for r in rd:
            rows.append(
                (
                    int(r["id"]),
                    [float(x) for x in r["feature"].split(",")],
                    r["stringfield"],
                    float(r["floatfield"]),
                    float(r["doublefield"]),
                    int(r["intfield"]),
                    int(r["longfield"]),
                    r["booleanfield"] == "true",
                )
            )
    schema = (
        "tid long, vectorfield array<float>, stringfield string, "
        "floatfield float, doublefield double, intfield int, "
        "longfield long, booleanfield boolean"
    )
    return spark.createDataFrame(rows, schema)


def load_expected(name):
    out = []
    with open(os.path.join(GT, name)) as f:
        for line in f:
            if not line.strip():
                continue
            d, tid = line.split("\t")
            out.append((float(d), int(tid)))
    return out


def load_query():
    with open(os.path.join(GT, "nnquery.txt")) as f:
        return [float(x) for x in f.read().strip().split(",")]


@pytest.fixture(scope="module")
def gt_df(spark):
    return load_fixture(spark).cache()


def test_sequential_scan_matches_golden(spark, gt_df):
    q = load_query()
    expected = load_expected("100nn-results.tsv")
    res = sequential_scan(
        gt_df, "vectorfield", q, k=len(expected), distance_name="manhattan", pk="tid"
    ).select("tid", "ap_distance").collect()
    assert len(res) == len(expected)
    got = {r["tid"]: r["ap_distance"] for r in res}
    for dist, tid in expected:
        assert tid in got, f"tid {tid} missing from result"
        assert got[tid] == pytest.approx(dist, abs=1e-4)


def test_sequential_scan_with_boolean_query_matches_golden(spark, gt_df):
    """NN + BQ combined (100nn-bq-results.tsv; bquery.tsv: stringfield = 'bq')."""
    q = load_query()
    expected = load_expected("100nn-bq-results.tsv")
    filtered = boolean_filter(gt_df, [("stringfield", "=", ["bq"])])
    res = sequential_scan(
        filtered, "vectorfield", q, k=len(expected), distance_name="manhattan", pk="tid"
    ).select("tid", "ap_distance").collect()
    assert len(res) == len(expected)
    got = {r["tid"]: r["ap_distance"] for r in res}
    for dist, tid in expected:
        assert tid in got
        assert got[tid] == pytest.approx(dist, abs=1e-4)


def test_zero_weights_all_zero_distances(spark, gt_df):
    """Weighted variant: all-zero weights => every distance 0
    (QueryTestSuite.scala:59-77)."""
    q = load_query()
    res = sequential_scan(
        gt_df, "vectorfield", q, k=100, distance_name="manhattan",
        weights=[0.0] * len(q), pk="tid",
    ).select("ap_distance").collect()
    assert len(res) == 100
    assert all(r["ap_distance"] == 0.0 for r in res)


def test_prefilter_semijoin(spark, gt_df):
    """Candidate pre-filter pipeline == left-semi join
    (SequentialScanExpression.scala:88-121)."""
    q = load_query()
    cand = gt_df.filter(F.col("tid") < 1000).select("tid")
    res = sequential_scan(
        gt_df, "vectorfield", q, k=50, distance_name="manhattan",
        prefilter=cand, pk="tid",
    ).collect()
    assert len(res) == 50
    assert all(r["tid"] < 1000 for r in res)
