"""PySpark-native analytics engine with the query/data-processing
capabilities of kavyarana/cryptocurrency-data-pipeline.

Spark-first design: everything is declared with the DataFrame/SQL API so
Catalyst + Tungsten pick the physical plan (predicate pushdown, column
pruning, broadcast joins, AQE).  Python UDFs appear only where built-in
operators genuinely cannot express the semantics (MinHash, SimHash,
multimodal decode), and then always as Arrow-batched Pandas UDFs.
"""

from cryptocurrency_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
