"""Vector index structures (SURVEY §2.4).

Each index is a DataFrame ``(pk, ap_indexfeature)`` plus small driver-side
metadata (marks / centroids / projections) — exactly the reference's shape
(data/index/Index.scala:442-471), which is already Spark-idiomatic.  Scans
produce a candidate PK set; the engine then refines candidates with an
exact sequential scan (IndexScanExpression.scala:89-98).
"""

from adampro_spark.index.ecp import build_ecp, ecp_knn, scan_ecp
from adampro_spark.index.ivfpq import build_ivfpq, ivfpq_knn, scan_ivfpq
from adampro_spark.index.lsh import build_lsh, lsh_knn, scan_lsh
from adampro_spark.index.mi import build_mi, mi_knn, scan_mi
from adampro_spark.index.pq import build_pq, pq_knn, scan_pq
from adampro_spark.index.sh import build_sh, scan_sh, sh_knn
from adampro_spark.index.va import build_va, scan_va, va_knn
from adampro_spark.index.vaplus import build_vaplus, scan_vaplus, vaplus_knn

__all__ = [
    "build_ecp", "scan_ecp", "ecp_knn",
    "build_ivfpq", "scan_ivfpq", "ivfpq_knn",
    "build_lsh", "scan_lsh", "lsh_knn",
    "build_mi", "scan_mi", "mi_knn",
    "build_pq", "scan_pq", "pq_knn",
    "build_sh", "scan_sh", "sh_knn",
    "build_va", "scan_va", "va_knn",
    "build_vaplus", "scan_vaplus", "vaplus_knn",
]
