from libspatialindex_spark.plans import cover, manifest  # noqa: F401
