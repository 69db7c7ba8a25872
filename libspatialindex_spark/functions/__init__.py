from libspatialindex_spark.functions import curves, geometry  # noqa: F401
