"""Batched pandas-UDF geocoding (the north-rule's Arrow encode stage).

The curve key has two equivalent implementations:

* :func:`curves.z_key` — pure Column expression (JVM codegen; preferred
  when inputs are already columns);
* :func:`geocode_udf` here — Arrow-batched pandas UDF over numpy
  (``curves.np_z_key``), for pipelines where geocoding happens inside a
  Python stage anyway (e.g. fused with image decode) or where the real
  deployment swaps in an H3/S2 native library with a Python binding.

Both are bit-identical (tested), so plans may mix them freely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from libspatialindex_spark.config import EngineConfig
from libspatialindex_spark.functions import curves


def geocode_udf(conf: EngineConfig):
    """Returns a pandas UDF (x: double, y: double) → z: long."""

    @pandas_udf("long")
    def _geocode(x, y):  # type: ignore[no-untyped-def]
        import pandas as pd

        z = curves.np_z_key(x.to_numpy(), y.to_numpy(), conf)
        return pd.Series(z)

    return _geocode


def z_key_batched(x, y, conf: EngineConfig) -> Column:
    xc = x if isinstance(x, Column) else F.col(x)
    yc = y if isinstance(y, Column) else F.col(y)
    return geocode_udf(conf)(xc, yc)
