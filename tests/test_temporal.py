"""Temporal join operators: as-of join and range join vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_vector_search_spark.operators.temporal import asof_join, range_join


@pytest.fixture(scope="module")
def sides(spark):
    # left: (key, ts); right: (key, ts, value) with equal-ts ties and a
    # key that has no right rows at all
    left = spark.createDataFrame(
        [
            (1, 100, "a"),
            (1, 205, "b"),
            (1, 300, "c"),
            (2, 50, "d"),
            (2, 400, "e"),
            (3, 999, "f"),  # key with no right rows
        ],
        "user_id long, ts_ns long, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, 100, 10, 1.0),   # equal-ts match (inclusive)
            (1, 100, 11, 2.0),   # tie on ts -> greatest tiebreak (11) wins
            (1, 200, 12, 3.0),
            (1, 250, 13, 4.0),
            (2, 60, 14, 5.0),    # after left's ts=50 -> no match for 'd'
        ],
        "user_id long, ts_ns long, rid long, value double",
    )
    return left, right


def brute_asof(left_rows, right_rows, tolerance=None):
    out = {}
    for k, lts, tag in left_rows:
        cands = [
            r for r in right_rows
            if r[0] == k and r[1] <= lts
            and (tolerance is None or r[1] >= lts - tolerance)
        ]
        if cands:
            best = max(cands, key=lambda r: (r[1], r[2]))
            out[(k, lts)] = (best[1], best[2], best[3])
        else:
            out[(k, lts)] = (None, None, None)
    return out


def test_asof_matches_brute_force(spark, sides):
    left, right = sides
    got = asof_join(
        left, right, on="user_id",
        right_cols=("rid", "value"), right_tiebreak="rid",
    ).collect()
    want = brute_asof(
        [(r.user_id, r.ts_ns, r.tag) for r in left.collect()],
        [(r.user_id, r.ts_ns, r.rid, r.value) for r in right.collect()],
    )
    assert len(got) == left.count()
    for row in got:
        w_ts, w_rid, w_val = want[(row.user_id, row.ts_ns)]
        assert (row.asof_ts, row.asof_rid, row.asof_value) == (w_ts, w_rid, w_val), row


def test_asof_keeps_all_left_columns(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="user_id", right_cols=("value",))
    assert set(out.columns) == {"user_id", "ts_ns", "tag", "asof_ts", "asof_value"}


def test_asof_tolerance_nulls_stale_matches(spark, sides):
    left, right = sides
    # tolerance 60: left (1, 300) matched right ts=250 (age 50, kept);
    # left (2, 400) matched right ts=60 (age 340, nulled)
    got = {
        (r.user_id, r.ts_ns): (r.asof_ts, r.asof_value)
        for r in asof_join(
            left, right, on="user_id",
            right_cols=("value",), right_tiebreak="rid", tolerance=60,
        ).collect()
    }
    assert got[(1, 300)] == (250, 4.0)
    assert got[(2, 400)] == (None, None)
    assert got[(3, 999)] == (None, None)


def test_asof_equal_ts_is_inclusive_and_tiebroken(spark, sides):
    left, right = sides
    got = {
        (r.user_id, r.ts_ns): (r.asof_ts, r.asof_rid)
        for r in asof_join(
            left, right, on="user_id",
            right_cols=("rid",), right_tiebreak="rid",
        ).collect()
    }
    # left (1,100): right rows at the SAME ts are eligible; rid 11 > 10 wins
    assert got[(1, 100)] == (100, 11)


@pytest.mark.parametrize("bin_width", [None, 7, 100, 1000])
def test_range_join_matches_brute_force(spark, bin_width):
    rows = [(k, i, 13 * i % 97 + 100 * k) for k in (1, 2) for i in range(40)]
    df = spark.createDataFrame(
        [(k, eid, ts) for (k, eid, ts) in rows],
        "user_id long, event_id long, ts_ns long",
    )
    lo, hi = 0, 25
    got = {
        (r.user_id, r.l_id, r.r_id, r.delta)
        for r in range_join(
            df, df, on="user_id", min_delta=lo, max_delta=hi,
            bin_width=bin_width,
        ).collect()
    }
    want = {
        (ka, a, b, tb - ta)
        for (ka, a, ta) in rows
        for (kb, b, tb) in rows
        if ka == kb and lo < tb - ta <= hi
    }
    assert got == want


def test_range_join_no_self_pairs_at_delta_zero(spark):
    df = spark.createDataFrame(
        [(1, 1, 100), (1, 2, 100), (1, 3, 150)],
        "user_id long, event_id long, ts_ns long",
    )
    got = {
        (r.l_id, r.r_id, r.delta)
        for r in range_join(df, df, on="user_id", max_delta=50).collect()
    }
    # delta 0 pairs (1,2),(2,1),(1,1)... excluded; only the +50 pairs remain
    assert got == {(1, 3, 50), (2, 3, 50)}

def test_asof_forward_and_nearest(spark):
    """Forward = earliest right >= left.ts (inclusive); nearest = smaller
    |delta|, ties -> backward (pandas merge_asof semantics)."""
    from clinical_vector_search_spark.operators.temporal import (
        asof_join,
        asof_join_nearest,
    )

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (1, 35, 102), (2, 5, 200)],
        "k long, ts_ns long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 8, 1.0), (1, 20, 2.0), (1, 30, 3.0), (1, 50, 4.0)],
        "k long, ts_ns long, value double",
    )
    fwd = {
        r.lid: (r.asof_ts, r.asof_value)
        for r in asof_join(
            left, right, "k", direction="forward"
        ).collect()
    }
    assert fwd == {
        100: (20, 2.0),   # earliest >= 10
        101: (20, 2.0),   # inclusive at equality
        102: (50, 4.0),   # skips past 30 < 35
        200: (None, None) # key 2 has no rights
    }
    near = {
        r.lid: (r.asof_ts, r.asof_value)
        for r in asof_join_nearest(left, right, "k").collect()
    }
    assert near == {
        100: (8, 1.0),    # |10-8|=2 < |20-10|=10
        101: (20, 2.0),   # exact
        102: (30, 3.0),   # |35-30|=5 < |50-35|=15
        200: (None, None),
    }
    # equidistant tie -> backward wins
    left2 = spark.createDataFrame([(1, 25, 300)], "k long, ts_ns long, lid long")
    near2 = {r.lid: r.asof_ts for r in asof_join_nearest(left2, right, "k").collect()}
    assert near2 == {300: 20}  # |25-20| == |30-25| -> backward


def test_scd2_merge_versions_and_passthrough(spark):
    """Closed history passes through; open version closes when the state
    changes; no-change updates create no version; equal-ts ties are
    deterministic via the tracked tiebreak."""
    from clinical_vector_search_spark.operators.temporal import scd2_merge

    current = spark.createDataFrame(
        [
            (1, "bronze", 0, 100),     # closed — must pass through
            (1, "silver", 100, None),  # open
            (2, "bronze", 50, None),   # open, no updates -> stays open
        ],
        "user_id long, tier string, valid_from long, valid_to long",
    )
    updates = spark.createDataFrame(
        [
            (1, "silver", 150),  # no change -> no new version
            (1, "gold", 200),    # change -> close silver at 200
            (3, "bronze", 300),  # brand-new key
            (3, "gold", 400),
        ],
        "user_id long, tier string, ts_ns long",
    )
    got = {
        (r.user_id, r.tier, r.valid_from): r.valid_to
        for r in scd2_merge(
            current, updates, "user_id", ["tier"]
        ).collect()
    }
    assert got == {
        (1, "bronze", 0): 100,
        (1, "silver", 100): 200,
        (1, "gold", 200): None,
        (2, "bronze", 50): None,
        (3, "bronze", 300): 400,
        (3, "gold", 400): None,
    }


def test_scd2_asof_composition_equals_interval_containment(spark, sf_dir):
    """The point-in-time feature join's structural identity: a backward
    as-of on valid_from over the contiguous non-zero-width SCD2 history
    returns exactly the rows of the interval-containment join
    (valid_from <= ts < valid_to) — pinned engine-internally so the
    entry's oracle equivalence isn't carrying the whole proof."""
    from clinical_vector_search_spark.operators.temporal import (
        asof_join,
        scd2_merge,
    )

    from clinical_vector_search_spark.streaming.events import read_events

    ev = (
        read_events(spark, sf_dir)
        .select("event_id", "user_id", "ts_ns", "event_type")
        .filter(F.col("user_id") < 30)
    )
    empty = spark.createDataFrame(
        [],
        "user_id long, event_type string, valid_from long, valid_to long",
    )
    hist = scd2_merge(empty, ev, "user_id", ["event_type"])
    live = hist.filter(
        F.col("valid_to").isNull()
        | (F.col("valid_to") > F.col("valid_from"))
    )
    probes = ev.select("event_id", "user_id", "ts_ns")
    via_asof = asof_join(
        probes,
        live.select(
            "user_id",
            F.col("valid_from").alias("ts_ns"),
            F.col("event_type").alias("state"),
        ),
        on="user_id",
        right_cols=("state",),
        prefix="dim_",
    ).select("event_id", "dim_state", F.col("dim_ts").alias("dim_since"))
    via_containment = (
        probes.alias("e")
        .join(
            live.alias("h"),
            (F.col("e.user_id") == F.col("h.user_id"))
            & (F.col("h.valid_from") <= F.col("e.ts_ns"))
            & (
                F.col("h.valid_to").isNull()
                | (F.col("e.ts_ns") < F.col("h.valid_to"))
            ),
        )
        .select(
            "event_id",
            F.col("h.event_type").alias("dim_state"),
            F.col("h.valid_from").alias("dim_since"),
        )
    )
    a = sorted(map(tuple, via_asof.collect()))
    b = sorted(map(tuple, via_containment.collect()))
    assert a == b and len(a) == probes.count()
    assert all(r[1] is not None for r in a)  # every event has a version


def test_merge_upsert_four_clauses(spark):
    from pyspark.sql import functions as SF

    from clinical_vector_search_spark.operators.temporal import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, bal double",
    )
    source = spark.createDataFrame(
        [
            (2, "b2", 22.0, False),   # matched update
            (3, "c", 30.0, True),     # matched delete
            (4, "d", 40.0, False),    # not-matched insert
            (5, "e", 50.0, True),     # source-only delete -> no-op
        ],
        "id long, name string, bal double, is_del boolean",
    )
    out = {
        r.id: r
        for r in merge_upsert(
            target, source, ["id"], delete_condition=SF.col("is_del")
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1].name == "a" and out[1].bal == 10.0        # untouched
    assert out[2].name == "b2" and out[2].bal == 22.0       # updated
    assert out[4].name == "d" and out[4].bal == 40.0        # inserted
    # explicit update_cols: only bal updates, name keeps target value
    out2 = {
        r.id: r
        for r in merge_upsert(
            target, source.filter(~SF.col("is_del")), ["id"],
            update_cols=["bal"],
        ).collect()
    }
    assert out2[2].name == "b" and out2[2].bal == 22.0
    assert out2[4].name is None and out2[4].bal == 40.0     # INSERT sets
    # only the named columns; the rest are NULL (SQL MERGE contract)


def test_scd2_apply_changes_equals_full_merge(spark):
    """Incremental SCD2 maintenance (scd2_apply_changes) must equal both
    scd2_merge(history, changes) and — for a time-ordered feed — the
    one-shot merge of the whole feed, with untouched keys passing
    through byte-identically. Feed mixes: a key updated in both halves,
    a key only in the seed (untouched by the batch — the passthrough
    branch), a key only in the batch (new-key insert), and a key whose
    batch update repeats its open state (no new version)."""
    from clinical_vector_search_spark.operators.temporal import (
        scd2_apply_changes,
        scd2_merge,
    )

    rows = [
        (1, 10, "a"), (1, 20, "b"),            # seed
        (2, 15, "x"),                           # seed only — untouched
        (4, 12, "p"), (4, 18, "p"),            # seed, dup state
        (1, 40, "c"),                           # batch: version change
        (3, 45, "n"),                           # batch: brand-new key
        (4, 50, "p"),                           # batch: repeats open state
    ]
    upd = spark.createDataFrame(rows, "k long, ts_ns long, s string")
    cut = 35
    empty = spark.createDataFrame(
        [], "k long, s string, valid_from long, valid_to long"
    )
    seed = scd2_merge(empty, upd.filter(F.col("ts_ns") < cut), "k", ["s"])
    changes = upd.filter(F.col("ts_ns") >= cut)

    def hist(df):
        return sorted(
            (r.k, r.s, r.valid_from, r.valid_to) for r in df.collect()
        )

    inc = hist(scd2_apply_changes(seed, changes, "k", ["s"]))
    assert inc == hist(scd2_merge(seed, changes, "k", ["s"]))
    assert inc == hist(scd2_merge(empty, upd, "k", ["s"]))
    # untouched key 2 and the dup-state batch for key 4 create no rows
    # beyond the one-shot's: key 2 one open version, key 4 one open version
    assert [r for r in inc if r[0] == 2] == [(2, "x", 15, None)]
    assert [r for r in inc if r[0] == 4] == [(4, "p", 12, None)]
