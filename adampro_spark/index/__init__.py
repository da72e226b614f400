"""Vector index structures (SURVEY §2.4).

Each index is a DataFrame ``(pk, ap_indexfeature)`` plus small driver-side
metadata (marks / centroids / projections) — exactly the reference's shape
(data/index/Index.scala:442-471), which is already Spark-idiomatic.  Scans
produce a candidate PK set; the engine then refines candidates with an
exact sequential scan (IndexScanExpression.scala:89-98).
"""

from adampro_spark.index.va import build_va, scan_va, va_knn

__all__ = ["build_va", "scan_va", "va_knn"]
