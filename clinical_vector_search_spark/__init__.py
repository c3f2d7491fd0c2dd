"""clinical_vector_search_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference system `srinisvas/clinical_vector_search`
(an end-to-end semantic-search benchmark over clinical transcriptions), plus
the large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) such an engine needs at 100 TB scale.

Design principles (see SURVEY.md):
  * DataFrame/SQL first — declare the logical plan, let Catalyst/Tungsten
    pick the physical strategy.
  * Vector data is ``ArrayType(FloatType)`` columns; vector math is SQL
    higher-order functions (JVM codegen) with Arrow/pandas-UDF fast paths
    only where built-ins can't express the semantics.
  * "Index = data": where the reference serializes FAISS index files
    (src/pipeline/pipeline.py:126-136), we persist normalized-embedding
    Parquet tables; building an index is a batch job, searching is a query.
  * Every stochastic operator is seeded/deterministic (the reference's
    unseeded DP noise at src/pipeline/pipeline_mode.py:79 is deliberately
    hardened here so results are testable).
"""

__version__ = "0.1.0"

from clinical_vector_search_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
