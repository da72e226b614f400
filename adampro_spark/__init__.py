"""adampro_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vitrivr/ADAMpro.

ADAMpro (reference: /root/reference, Scala/Spark 2.4) is a multimedia
retrieval database: vector k-NN search with Boolean metadata filtering,
approximate/exact vector indexes, result-set fusion, and a hint/cost-based
access-path planner.  This package re-expresses those capabilities
Spark-first: logical plans are declared with the DataFrame API and Catalyst
picks the physical strategy; distances are native higher-order-function
column expressions (whole-stage codegen, no Python on the hot path).
"""

from adampro_spark.session import get_spark, load_tables


def __getattr__(name):
    # lazy facade import (avoids a hard pyspark import chain at package
    # import time for tooling that only wants metadata)
    if name == "AdamOps":
        from adampro_spark.ops import AdamOps

        return AdamOps
    raise AttributeError(name)


__all__ = ["get_spark", "load_tables", "AdamOps"]

__version__ = "0.1.0"
