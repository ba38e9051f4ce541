"""mapreduce__spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference MapReduce framework (ranrubin/MapReduce-): typed key-value
Map -> Shuffle(group-by-key) -> Reduce -> ordered output, generalized to the
full relational algebra that model canonically expresses, plus the
LLM-data-pipeline extensions (dedup, similarity search, multimodal columns,
text analysis) — all declared through the DataFrame/SQL API so Catalyst and
Tungsten choose the physical plan.

Layout:
    session     SparkSession factory tuned for local[N] testing and
                documented for 1000-executor scale.
    sources     parquet table loaders for the driver testdata schema.
    operators   reusable operator implementations (kernel, dedup,
                similarity, text, multimodal).
    functions   scalar-function catalog helpers.
    plans       the named query registry consumed by __spark_entry__.
    streaming   Structured Streaming counterparts of the event queries.
"""

from mapreduce__spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
