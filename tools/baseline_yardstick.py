#!/usr/bin/env python
"""Single-node NumPy yardstick for the baseline_knn bench family.

Every round's bench_vs_baseline ratio compares Spark's warm
``baseline_mode`` time against "what a competent single-node NumPy
implementation of the same query takes at the same SF" — the honest
floor BASELINE.md's sub-ms FAISS latencies can't provide (those exclude
index build and run under no scheduling floor at all). Until round 8
that NumPy figure (~0.154 s at sf0.1) was folklore carried between
verdicts; this script makes it reproducible.

Same semantics as ``pipeline.modes.baseline_mode(spark, sf, k=10,
n_queries=10)``: load embeddings + documents parquet, L2-normalize with
the same +1e-9 epsilon, take the first 10 corpus vectors as the query
set (query_id == doc_id), exact cosine top-10 via argpartition, join
back to documents for the 200-char snippet, order by (query_id, rank).

``value`` is the END-TO-END single-node time loading the way the
REFERENCE loads — ``pd.read_parquet`` + ``np.vstack(col.values)``
(reference pipeline_mode.py:33, evaluation.py:75-76) — because the
contract is match-or-beat the reference's single-node throughput, so
the yardstick must do the reference's work, not an idealized rewrite.
Two sidecar numbers bound it: ``optimized_sec`` swaps the load for a
zero-copy Arrow list flatten (the best honest single-node floor), and
``query_sec`` isolates the warm compute with data already in ndarrays
(shows the scheduling-floor share of Spark's time). The verdict ratio
is BENCH_rN.queries.baseline_knn / ``value``; report the
``optimized_sec`` ratio alongside when quoting it.

Usage: python tools/baseline_yardstick.py [--sf-dir DIR] [--repeat N]
Prints ONE JSON line; the verdict's ratio is
BENCH_rN.queries.baseline_knn / this script's ``value``.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import pyarrow.parquet as pq


def run_query(
    emb: np.ndarray, ids: np.ndarray, texts: dict, k: int, n_queries: int
):
    """One full baseline query over pre-loaded raw arrays."""
    norms = np.sqrt((emb * emb).sum(axis=1)) + 1e-9
    v = emb / norms[:, None]
    qmask = ids < n_queries
    q = v[qmask]
    qids = ids[qmask]
    scores = q @ v.T  # (n_queries, n_corpus) cosine
    # argpartition then sort the k-slice — the argpartition top-k every
    # competent single-node implementation uses
    part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    rows = []
    for qi in range(part.shape[0]):
        cand = part[qi]
        order = cand[np.argsort(-scores[qi, cand], kind="stable")]
        for rank, ci in enumerate(order, start=1):
            doc_id = int(ids[ci])
            rows.append(
                (
                    int(qids[qi]),
                    rank,
                    doc_id,
                    round(float(scores[qi, ci]), 6),
                    texts.get(doc_id, "")[:200],
                )
            )
    rows.sort(key=lambda r: (r[0], r[1]))
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=10)
    args = ap.parse_args()

    def load_reference_style():
        """pd.read_parquet + np.vstack — reference pipeline_mode.py:33."""
        import pandas as pd

        pdf = pd.read_parquet(
            f"{args.sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        ids = pdf["vec_id"].to_numpy()
        emb = np.vstack(pdf["embedding"].values).astype(np.float64)
        ddf = pd.read_parquet(
            f"{args.sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        texts = dict(zip(ddf["doc_id"], ddf["text"]))
        return emb, ids, texts

    def load_optimized():
        """Zero-copy Arrow list flatten — the best-case single-node load."""
        et = pq.read_table(
            f"{args.sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        ids = et.column("vec_id").to_numpy()
        col = et.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        emb = flat.reshape(len(col), -1).astype(np.float64, copy=False)
        dt = pq.read_table(
            f"{args.sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        texts = dict(
            zip(dt.column("doc_id").to_pylist(), dt.column("text").to_pylist())
        )
        return emb, ids, texts

    t0 = time.perf_counter()
    emb, ids, texts = load_reference_style()
    load_sec = round(time.perf_counter() - t0, 4)

    rows = run_query(emb, ids, texts, args.k, args.n_queries)  # warmup
    # self-retrieval sanity: top-1 of each query is itself at score ~1
    top1 = {r[0]: (r[2], r[3]) for r in rows if r[1] == 1}
    assert all(q == d and abs(s - 1.0) < 1e-6 for q, (d, s) in top1.items()), (
        "self-retrieval sanity failed", top1,
    )

    qtimes, e2e, opt = [], [], []
    for _ in range(args.repeat):
        t = time.perf_counter()
        emb2, ids2, texts2 = load_reference_style()  # page-cache warm
        tq = time.perf_counter()
        run_query(emb2, ids2, texts2, args.k, args.n_queries)
        now = time.perf_counter()
        qtimes.append(now - tq)
        e2e.append(now - t)
        t = time.perf_counter()
        run_query(*load_optimized(), args.k, args.n_queries)
        opt.append(time.perf_counter() - t)

    print(
        json.dumps(
            {
                "metric": "numpy_baseline_knn",
                "value": round(min(e2e), 4),
                "unit": "sec",
                "mean_sec": round(sum(e2e) / len(e2e), 4),
                "optimized_sec": round(min(opt), 4),
                "query_sec": round(min(qtimes), 4),
                "load_cold_sec": load_sec,
                "n_vectors": int(emb.shape[0]),
                "dim": int(emb.shape[1]),
                "k": args.k,
                "n_queries": args.n_queries,
                "repeat": args.repeat,
                "sf_dir": args.sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
