"""libspatialindex_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch rebuild of the query capabilities of the AI-DB-UoM fork of
libspatialindex (R*-tree / MVR-tree / TPR-tree / KD-tree / learned-index C++
library) re-expressed Spark-first:

* the C++ tree hierarchy becomes a **two-level distributed index**: a
  driver-side global range partitioning over a space-filling-curve key
  (the STR / SFC bulk-load analog, reference ``src/rtree/BulkLoader.cc``)
  plus per-partition sorted Arrow pages with zone-map manifests;
* tree-descent MBR pruning becomes **partition/file pruning** on the curve
  key plus vectorized closed-interval predicates compiled by Catalyst
  (reference predicate semantics: ``src/spatialindex/Region.cc:264-429``);
* the query surface (range intersection, containment, point location, kNN
  with tie inclusion, window-restricted spatial self-join, bounds/count,
  offset/limit) mirrors ``src/rtree/RTree.cc:578-835`` — see SURVEY.md §2.

Everything here is public-knowledge PySpark: DataFrame/SQL first, Arrow
pandas UDFs only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

from libspatialindex_spark.config import EngineConfig  # noqa: F401
from libspatialindex_spark.session import get_spark  # noqa: F401
