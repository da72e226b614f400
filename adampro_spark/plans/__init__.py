from adampro_spark.plans.rewrite import maybe_collapse_prefilter  # noqa: F401
