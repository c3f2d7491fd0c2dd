"""Shared JIT/HOF warmup identical to bench.py's pre-timing block."""
def warm_session(spark, sf_dir):
    from pyspark.sql import functions as F
    import pandas as _pd
    from pyspark.sql import Window as _W
    import sys
    sys.path.insert(0, '/root/repo')
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.pipeline.embedding import hash_embed as _he
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    spark.createDataFrame(_pd.DataFrame({"x": [1.0]})).mapInPandas(
        lambda it: it, "x double").count()
    def _noop(df): df.write.format("noop").mode("overwrite").save()
    _warm = spark.range(40000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 997).cast("string"),
                 F.lit(" word "), (F.col("id") % 31).cast("string")).alias("text"),
        F.transform(F.sequence(F.lit(0), F.lit(15)),
                    lambda i: ((F.col("id") % 7) + i).cast("double")).alias("v"))
    _wn = _warm.select("doc_id", V.l2_normalize("v").alias("v"))
    _noop(_wn.select(V.dot("v", "v").alias("s"),
                     V.add_noise("v", "doc_id", 0.1, 16).alias("n"),
                     V.random_projection("v", 16, 4).alias("p")))
    _w = _W.partitionBy(F.col("doc_id") % 100).orderBy(F.desc("doc_id"))
    _noop(_warm.select(F.row_number().over(_w).alias("r")).filter(F.col("r") <= 5))
    _he(_warm, 8).count()
