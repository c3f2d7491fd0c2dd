"""Distributed BPE merge-training — learn a byte-pair-encoding merge
table from a corpus (the tokenizer-training stage of an LLM data
pipeline; the BPE-ish token COUNTER in functions.text consumes a
tokenizer, this module produces one).

Scale design: classic BPE trains on the word-frequency dictionary, not
the corpus — the first aggregation collapses 100 TB of text into a
vocabulary-sized (word, count) frame, and every merge iteration after
that touches only that frame. Each iteration is (1) one pair-count
aggregation + a single-row collect picking the most frequent adjacent
symbol pair, and (2) a pure-expression left-to-right fold rewriting each
word's symbol array — no Python UDF, no per-row driver work. Iterations
persist/unpersist like operators.graph.pagerank so lineage stays flat.

Determinism: ties break by (count desc, left asc, right asc); the fold
merges leftmost-first non-overlapping occurrences ("aaa" + (a,a) →
[aa, a]) — exactly the reference semantics pytest pins against an
independent single-node implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "▁"  # end-of-word marker symbol (visible, never in tokens)


def _char_symbols(word) -> F.Column:
    """Initial symbol sequence: characters + end-of-word marker."""
    return F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: word.substr(i, F.lit(1)),
        ),
        F.array(F.lit(EOW)),
    )


def word_symbol_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, n, symbols): the word-frequency dictionary with initial
    character symbol arrays — the ONLY corpus-sized aggregation in BPE
    training."""
    from clinical_vector_search_spark.functions.text import tokenize

    words = (
        df.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return words.select(
        "word", "n", _char_symbols(F.col("word")).alias("symbols")
    )


def adjacent_pair_counts(vocab: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent symbol-pair counts over the vocabulary
    frame: (left, right, pair_count). Map-side explode + one combinable
    aggregation."""
    pairs = vocab.select(
        "n",
        F.explode(
            F.when(
                F.size("symbols") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("symbols") - 1),
                    lambda i: F.struct(
                        F.element_at("symbols", i).alias("left"),
                        F.element_at("symbols", i + 1).alias("right"),
                    ),
                ),
            ).otherwise(F.expr(
                "cast(array() as array<struct<left:string,right:string>>)"
            ))
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(
        F.sum("n").alias("pair_count")
    )


def _merge_fold(left: str, right: str) -> F.Column:
    """Left-to-right greedy merge of adjacent (left, right) into one
    concatenated symbol, as a pure aggregate-fold expression."""
    return F.aggregate(
        F.col("symbols"),
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 20,
    min_pair_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    table as [(merge_rank, left, right, pair_count)] in learned order —
    the tokenizer artifact (see :func:`bpe_merges_df` for the DataFrame
    form). Stops early when no pair reaches ``min_pair_count``.

    Iterations are pinned with ``localCheckpoint`` (not ``cache``):
    caching short-circuits EXECUTION but leaves the full logical
    lineage in the plan, and twenty chained fold expressions make plan
    stringification itself blow the driver heap (observed: OOM inside
    AQE's explainString at merge ~15). Checkpointing truncates the
    plan to a LogicalRDD each round, so iteration k's plan is always
    one fold deep."""
    vocab = word_symbol_frame(df, text_col, id_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            adjacent_pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        merges.append((rank, left, right, cnt))
        vocab = vocab.select(
            "word", "n", _merge_fold(left, right).alias("symbols")
        ).localCheckpoint()
    return merges


def bpe_merges_df(spark, merges: list) -> DataFrame:
    """Merge table as a DataFrame (merge_rank, left, right, pair_count)."""
    return spark.createDataFrame(
        merges, "merge_rank long, left string, right string, pair_count long"
    )


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table: per-document token counts under the
    BPE vocabulary vs plain whitespace tokens — the compression-ratio
    signal that tells you whether a tokenizer fits a corpus (and the
    budget input for pack_sequences).

    Arrow-batched mapInPandas; the merge table rides the closure (it is
    n_merges rows — nothing to broadcast), and a per-task word memo
    collapses the work to vocabulary size, mirroring training.
    Whitespace tokenization matches ``functions.text.tokenize``
    (lower + split). Returns (id_col, n_tokens_ws, n_tokens_bpe).
    """
    import pandas as pd

    merge_list = [(m[1], m[2]) for m in merges]
    schema = f"{id_col} long, n_tokens_ws long, n_tokens_bpe long"

    def kernel(batches):
        memo: dict = {}

        def enc_len(word: str) -> int:
            n = memo.get(word)
            if n is not None:
                return n
            sym = list(word) + [EOW]
            for left, right in merge_list:
                out: list = []
                for s in sym:
                    if out and out[-1] == left and s == right:
                        out[-1] = left + right
                    else:
                        out.append(s)
                sym = out
            memo[word] = len(sym)
            return memo[word]

        for pdf in batches:
            ids, ws, bp = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").lower().split()
                ids.append(did)
                ws.append(len(toks))
                bp.append(sum(enc_len(w) for w in toks))
            yield pd.DataFrame(
                {id_col: ids, "n_tokens_ws": ws, "n_tokens_bpe": bp}
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
