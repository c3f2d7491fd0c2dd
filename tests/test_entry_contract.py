"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are
consistent, and a fast subset hash-matches DuckDB at sf0.001."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

FAST_ORACLE_SUBSET = [
    "doc_exact_dedup",
    "text_fingerprint",
    "vec_dot_cosine",
    "knn_exact",
    "metrics_eval",
    "events_tumbling",
    "doc_split_assign",
    "text_cdc_chunks",
]


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0


def test_queries_oracle_key_consistency():
    qs, os_ = E.queries(), E.oracle_sql()
    assert len(qs) >= 25
    assert set(os_) <= set(qs)  # every oracle has a query
    assert len(os_) >= 20


@pytest.mark.parametrize("name", FAST_ORACLE_SUBSET)
def test_oracle_subset_sf0001(spark, sf_dir, name):
    sdf = E.queries()[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "lineitem"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    odf = con.execute(E.oracle_sql()[name]).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    a = sdf[sorted(sdf.columns)].astype(str).sort_values(
        by=sorted(sdf.columns), ignore_index=True
    )
    b = odf[sorted(odf.columns)].astype(str).sort_values(
        by=sorted(odf.columns), ignore_index=True
    )
    assert a.equals(b), f"{name}: value mismatch"


def test_filter_audit_consistent_with_prep_pipeline(spark, sf_dir):
    """The audit's 'keep' decisions must be exactly the prep pipeline's
    survivor set — two spellings of one contract."""
    keep = {r.doc_id for r in E.q_doc_filter_audit(spark, sf_dir).collect()
            if r.decision == "keep"}
    surv = {r.doc_id for r in E.q_doc_prep_pipeline(spark, sf_dir).collect()}
    assert keep == surv and len(keep) > 0
