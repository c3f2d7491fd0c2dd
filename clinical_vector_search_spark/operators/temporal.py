"""Temporal join operators: as-of join and range join.

The reference has no temporal joins (SURVEY.md §2.6: no relational joins at
all), but a training-data event pipeline needs them constantly — "most
recent feature snapshot as of this label's timestamp", "events within N
seconds of an anchor". Spark has no built-in ASOF JOIN, and a naive theta
join (``l.ts >= r.ts``) degenerates to a per-key cross product; both
operators here are compositions of shuffle-friendly primitives:

* :func:`asof_join` — the union-merge shape: tag both sides, sort each key
  partition once by (ts, side), and carry the latest right-side payload
  forward with ``last(..., ignorenulls)``. ONE shuffle on the join key,
  O(n log n) per key, no replication — the same plan a dedicated ASOF
  physical operator would produce.

* :func:`range_join` — the bin-bucket shape: hash the right side to fixed
  time bins, explode the left side only to the bins its window overlaps
  (⌈span/bin⌉+1 rows), equi-join on (key, bin), then apply the exact range
  predicate. Turns an unbounded inequality join into a bounded equi-join —
  the standard trick Spark's own range-join hints (Databricks) and
  KDB/QuestDB interval engines use.

Both are oracle-checked against DuckDB (correlated-subquery / inequality
join formulations) in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts_ns",
    right_ts: str = "ts_ns",
    right_cols: tuple[str, ...] = ("value",),
    right_tiebreak: str | None = None,
    tolerance: int | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the matching right row for the same
    ``on`` key — ``direction`` picks the match (the pandas ``merge_asof``
    contract): ``"backward"`` (default) = most recent right with
    ``right.ts <= left.ts``; ``"forward"`` = earliest right with
    ``right.ts >= left.ts`` (both inclusive).

    Output: all left columns + ``{prefix}ts`` (matched right timestamp,
    null when no match) + ``{prefix}{c}`` for each of ``right_cols``.

    ``right_tiebreak`` breaks equal-timestamp ties deterministically (the
    greatest tiebreak value wins — matching the oracle's
    ``ORDER BY ts DESC, tiebreak DESC LIMIT 1``); ``tolerance`` (same unit
    as the ts columns) nulls matches further than ``tolerance`` from
    ``left.ts`` in the match direction.

    Plan shape: union of the two tagged sides → one shuffle on ``on`` →
    per-key sort by (ts, side, tiebreak) → running ``last(payload)
    ignorenulls`` → filter back to left rows; forward just flips the ts
    sort direction. Right rows iterate BEFORE left rows at equal ts,
    making the match inclusive either way.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    payload_fields = [F.col(c).alias(c) for c in right_cols]
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r = right.select(
        F.col(on),
        F.col(right_ts).cast("long").alias("_ts"),
        F.lit(0).alias("_side"),
        tb.cast("long").alias("_tb"),
        F.struct(
            F.col(right_ts).cast("long").alias("_matched_ts"), *payload_fields
        ).alias("_payload"),
    )
    l_cols = left.columns
    l = left.select(
        *l_cols,
        F.col(left_ts).cast("long").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tb"),
        F.lit(None)
        .cast(r.schema["_payload"].dataType)
        .alias("_payload"),
    )
    merged = l.select(
        F.col(on), "_ts", "_side", "_tb", "_payload",
        F.struct(*[F.col(c) for c in l_cols]).alias("_l"),
    ).unionByName(
        r.select(
            F.col(on), "_ts", "_side", "_tb", "_payload",
            F.lit(None).cast(
                l.select(F.struct(*[F.col(c) for c in l_cols]).alias("_l"))
                .schema["_l"].dataType
            ).alias("_l"),
        )
    )
    ts_order = F.asc("_ts") if direction == "backward" else F.desc("_ts")
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.asc("_side"), F.asc("_tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        merged.withColumn("_m", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    m_ts = F.col("_m._matched_ts")
    if tolerance is not None:
        in_range = (
            m_ts >= (F.col("_ts") - F.lit(tolerance))
            if direction == "backward"
            else m_ts <= (F.col("_ts") + F.lit(tolerance))
        )
        get = lambda c: F.when(in_range, F.col(f"_m.{c}"))  # noqa: E731
        m_ts = F.when(in_range, m_ts)
    else:
        get = lambda c: F.col(f"_m.{c}")  # noqa: E731
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in l_cols],
        m_ts.alias(f"{prefix}ts"),
        *[get(c).alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_id: str = "event_id",
    right_id: str = "event_id",
    left_ts: str = "ts_ns",
    right_ts: str = "ts_ns",
    max_delta: int = 0,
    min_delta: int = 0,
    bin_width: int | None = None,
) -> DataFrame:
    """All pairs (left row, right row) with the same ``on`` key and
    ``min_delta < right.ts - left.ts <= max_delta`` (strict lower bound:
    a row never range-joins itself at delta 0).

    Output: (on, l_id, r_id, delta) with delta = right.ts - left.ts.

    Plan shape: the right side lands in fixed-width time bins
    (``right.ts div bin_width`` — exactly one bin per row, so no pair is
    produced twice); the left side explodes only to the bins its target
    window ``(l.ts+min_delta, l.ts+max_delta]`` can overlap. The
    inequality predicate then runs AFTER an equi-join on (key, bin) — a
    bounded shuffle join instead of a per-key cross product. bin_width
    defaults to the window span; fan-out per left row is
    span/bin_width + 1 rows.
    """
    assert max_delta > min_delta, "empty range"
    span = max_delta - min_delta
    if bin_width is None:
        bin_width = span

    # integer div throughout — double division is inexact past 2^53 and
    # epoch-ns values are ~1.7e18 (same pitfall as streaming/events.py)
    r = right.select(
        F.col(on),
        F.col(right_id).alias("r_id"),
        F.col(right_ts).cast("long").alias("r_ts"),
    ).withColumn("_bin", F.expr(f"r_ts div {bin_width}"))
    # probe every bin the window (l_ts+min_delta, l_ts+max_delta] can touch;
    # per-row span/bin_width + 1 (or +2 at unlucky alignment) rows
    l = (
        left.select(
            F.col(on),
            F.col(left_id).alias("l_id"),
            F.col(left_ts).cast("long").alias("l_ts"),
        )
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.expr(f"(l_ts + {min_delta}) div {bin_width}"),
                    F.expr(f"(l_ts + {max_delta}) div {bin_width}"),
                )
            ),
        )
    )
    delta = F.col("r_ts") - F.col("l_ts")
    return (
        l.join(r, [on, "_bin"])
        .filter((delta > F.lit(min_delta)) & (delta <= F.lit(max_delta)))
        .select(on, "l_id", "r_id", delta.alias("delta"))
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts_ns",
    right_ts: str = "ts_ns",
    right_cols: tuple[str, ...] = ("value",),
    right_tiebreak: str | None = None,
    tolerance: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """direction="nearest": the closest right row on either side of
    ``left.ts`` (ties -> the backward match, pandas merge_asof semantics).
    Composed as a backward pass feeding a forward pass — still one shuffle
    shape each — then a per-row pick of the smaller |delta|.
    ``right_tiebreak`` disambiguates equal-timestamp right rows in each
    pass (greatest wins), making the result deterministic/oracle-checkable
    when right timestamps can collide."""
    b = asof_join(
        left, right, on, left_ts, right_ts, right_cols,
        right_tiebreak=right_tiebreak, tolerance=tolerance, prefix="_b_",
    )
    # the forward pass runs over the backward output (which keeps every
    # original left column), so the final select sees both match sets
    f = asof_join(
        b, right, on, left_ts, right_ts, right_cols,
        right_tiebreak=right_tiebreak, tolerance=tolerance, prefix="_f_",
        direction="forward",
    )
    lts = F.col(left_ts).cast("long")
    back_wins = F.col("_b_ts").isNotNull() & (
        F.col("_f_ts").isNull()
        | ((lts - F.col("_b_ts")) <= (F.col("_f_ts") - lts))
    )
    pick = lambda c: F.when(  # noqa: E731
        back_wins, F.col(f"_b_{c}")
    ).otherwise(F.col(f"_f_{c}"))
    keep = [c for c in left.columns]
    return f.select(
        *keep,
        pick("ts").alias(f"{prefix}ts"),
        *[pick(c).alias(f"{prefix}{c}") for c in right_cols],
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    ts_col: str = "ts_ns",
) -> DataFrame:
    """SCD2 (type-2 slowly-changing-dimension) merge: maintain a
    versioned history table (key, tracked..., valid_from, valid_to) from
    a batch of timestamped updates — the lakehouse pattern behind
    MERGE-based dimension maintenance.

      * CLOSED versions (valid_to not null) pass through untouched;
      * each key's OPEN version and its updates are re-sequenced by
        (ts, tracked...) — the tracked tuple as tiebreak makes equal-ts
        batches deterministic in any engine;
      * consecutive duplicate states collapse (an update that doesn't
        change the tracked attributes creates no version);
      * valid_from = the state's ts, valid_to = the next state's ts
        (null = still open).

    Scale shape: closed history is never shuffled; the two windows run
    per KEY over version-granularity rows (versions per key per batch
    are small by definition — a key whose attributes flap every event is
    a data-quality problem, not a plan problem). ``current`` may be an
    empty frame with the right schema for a from-scratch history build.
    """
    tracked = list(tracked_cols)
    closed = current.filter(F.col("valid_to").isNotNull())
    open_rows = current.filter(F.col("valid_to").isNull()).select(
        F.col(key_col),
        *tracked,
        F.col("valid_from").alias(ts_col),
    )
    states = open_rows.unionByName(
        updates.select(key_col, *tracked, ts_col)
    )
    w = Window.partitionBy(key_col).orderBy(ts_col, *tracked)
    state = F.struct(*tracked)
    changed = states.withColumn("_prev", F.lag(state).over(w)).filter(
        F.col("_prev").isNull() | ~F.col("_prev").eqNullSafe(state)
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, *tracked)
    versions = changed.select(
        F.col(key_col),
        *tracked,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )
    return closed.select(
        key_col, *tracked, "valid_from", "valid_to"
    ).unionByName(versions)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    update_cols: list[str] | None = None,
    delete_condition=None,
) -> DataFrame:
    """ANSI ``MERGE INTO`` emulation over plain DataFrames — the upsert
    surface OSS Spark only ships with a lakehouse format, expressed as
    ONE full-outer join + CASE routing (no second pass, no per-clause
    scans):

    - matched + ``delete_condition`` (on source columns) → row dropped;
    - matched otherwise → target row with ``update_cols`` taken from
      the source (WHEN MATCHED THEN UPDATE SET ...);
    - source-only → inserted (WHEN NOT MATCHED THEN INSERT);
    - target-only → kept unchanged.

    ``update_cols`` defaults to every non-key column the frames share.
    Keys must be non-null on both sides (null-keyed rows can't match —
    the same contract as SQL MERGE). Returns the merged frame; callers
    write it (or hand it to write_audit_publish for gated publishing).

    Scale shape: one key shuffle on each side — exactly the cost of the
    join a MERGE compiles to; with both sides bucketed on the key it is
    exchange-free. Source must be deduplicated on the key first (SQL
    MERGE raises on multi-match; here the caller owns that contract —
    compose with the latest-wins dedup when the source is a changelog).
    """
    if update_cols is None:
        shared = set(target.columns) & set(source.columns)
        update_cols = [c for c in target.columns
                       if c in shared and c not in key_cols]
    t = target.select(
        *[F.col(c).alias(f"_t_{c}") for c in target.columns]
    )
    # delete_condition is written against SOURCE column names; evaluate
    # it before the rename so callers never see the join-side aliases
    if delete_condition is not None:
        source = source.withColumn("_merge_del", delete_condition)
    s = source.select(
        *[F.col(c).alias(f"_s_{c}") for c in source.columns]
    )
    cond = None
    for k in key_cols:
        c = F.col(f"_t_{k}") == F.col(f"_s_{k}")
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")
    matched = F.col(f"_s_{key_cols[0]}").isNotNull() & F.col(
        f"_t_{key_cols[0]}"
    ).isNotNull()
    src_only = F.col(f"_t_{key_cols[0]}").isNull()
    if delete_condition is not None:
        # matched + del → row dropped; source-only + del → no-op (SQL
        # MERGE never inserts a delete); target-only rows carry a NULL
        # flag and are kept
        joined = joined.filter(
            ~F.coalesce(F.col("_s__merge_del"), F.lit(False))
        )
    out_cols = []
    for c in target.columns:
        if c in key_cols:
            out_cols.append(
                F.coalesce(F.col(f"_t_{c}"), F.col(f"_s_{c}")).alias(c)
            )
        elif c in update_cols:
            out_cols.append(
                F.when(matched | src_only, F.col(f"_s_{c}"))
                .otherwise(F.col(f"_t_{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"_t_{c}").alias(c))
    return joined.select(*out_cols)


def scd2_apply_changes(
    history: DataFrame,
    changes: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    ts_col: str = "ts_ns",
) -> DataFrame:
    """Incremental SCD2 maintenance from a change feed: re-merge ONLY the
    keys present in the batch; every other key's history passes through
    untouched. Result equals ``scd2_merge(history, changes, ...)`` (and,
    for a time-ordered feed, the one-shot merge of the full feed) — keys
    absent from the batch are fixpoints of the merge, so skipping them
    changes nothing. Keys must be NON-NULL (the same contract as
    :func:`merge_upsert` and SQL MERGE: the anti/semi joins never match
    NULL keys, so a NULL-keyed change would duplicate instead of close
    the NULL key's open version — ``scd2_merge`` itself window-groups
    NULLs together and would handle them). Pinned vs a full recompute in
    tests/test_temporal.py; the delta rule of incremental_agg_update /
    incremental_join_update (operators/audit.py) on the temporal axis.

    Scale shape: the touched-key set is batch-sized and BROADCAST, so
    the passthrough is a map-side anti join (zero shuffle of the
    untouched history — at 100 TB the dimension history dwarfs any one
    batch) and the semi join prunes the expensive per-key window
    re-sequencing to affected keys' version rows: maintenance cost is
    ∝ batch size, not dimension size.
    """
    touched = changes.select(key_col).distinct()
    kept = history.join(F.broadcast(touched), key_col, "left_anti")
    affected = history.join(F.broadcast(touched), key_col, "left_semi")
    return kept.unionByName(
        scd2_merge(affected, changes, key_col, tracked_cols, ts_col)
    )
