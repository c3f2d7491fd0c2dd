"""Table readers/writers for the engine (SURVEY.md §2.1 S1–S7).

"Index = data": the reference's FAISS index files (S5/S6,
src/pipeline/pipeline.py:126-136) become normalized-embedding Parquet
tables here — building an index is `build_vector_index` writing Parquet,
searching is a query over it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_vector_search_spark.functions import vector as V

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S4: parquet scan of a driver testdata table."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S3: parquet sink."""
    df.write.mode(mode).parquet(path)


def write_csv_single(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: single-file CSV metric sink (coalesce(1) — metric tables are
    tiny by construction; never use for data-scale outputs)."""
    df.coalesce(1).write.mode(mode).csv(path, header=True)


def build_vector_index(
    df: DataFrame, path: str, vec_col: str = "embedding"
) -> None:
    """S5 replacement: persist the L2-normalized vector table as Parquet.
    Searching this table with operators.knn is the reference's
    "load index + search" (pipeline_mode.py:38-49)."""
    normalized = df.withColumn(vec_col, V.l2_normalize(vec_col))
    write_parquet(normalized, path)


def build_bm25_index_table(
    docs: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Materialize the BM25 postings index as Parquet ("index = data").

    The lazy ``bm25_index`` plan re-derives its tokenize→explode subtree
    ~4× inside one DAG (Spark has no cross-DAG common-subexpression reuse),
    so an unmaterialized one-shot build scans the corpus 4 times — at
    100 TB the scan dominates everything else. Building the index as a
    batch job (this function) and scoring against the persisted table
    makes index build a one-scan-amortized cost, exactly like the vector
    index. Read it back with ``read_bm25_index``."""
    from clinical_vector_search_spark.operators.bm25 import bm25_index

    write_parquet(bm25_index(docs, id_col, text_col), path)


def read_bm25_index(spark: SparkSession, path: str) -> DataFrame:
    """Scan a materialized BM25 postings index (S6 analog)."""
    return spark.read.parquet(path)
