"""Property-based tests (hypothesis): randomized inputs against
independent reference implementations. Example counts are kept small —
every example runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

NS = 1_000_000_000

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user_id
        st.integers(min_value=0, max_value=50_000),      # ts seconds
        st.floats(min_value=-10, max_value=10, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


@_slow
@given(events_strategy)
def test_sessionize_skew_equals_plain_on_random_streams(spark, rows):
    """For ANY event stream, the skew-salted sessionizer must produce the
    identical session rollup multiset as the single-window one."""
    from clinical_vector_search_spark.streaming.events import (
        sessionize,
        sessionize_skew,
    )

    ev = spark.createDataFrame(
        [(u, t * NS, v) for u, t, v in rows],
        "user_id long, ts_ns long, value double",
    )
    # exact match on the integer session identity; sums compared with a
    # tolerance — the two plans aggregate in different orders, and rounding
    # two ulp-different doubles can straddle a rounding boundary
    key = lambda r: (  # noqa: E731
        r.user_id, r.n_events, r.session_start_ns, r.session_end_ns,
    )
    plain = sorted(
        (key(r), r.sum_value) for r in sessionize(ev, 1800).collect()
    )
    skew = sorted(
        (key(r), r.sum_value)
        for r in sessionize_skew(ev, 1800, 3600).collect()
    )
    assert [k for k, _ in skew] == [k for k, _ in plain]
    for (_, a), (_, b) in zip(skew, plain):
        assert abs(a - b) < 1e-9, (a, b)


@_slow
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1000)),
             min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1000)),
             min_size=0, max_size=20),
)
def test_asof_join_matches_python_reference(spark, lefts, rights):
    """Backward/forward as-of joins vs a brute-force per-row reference
    (most recent right <= ts / earliest right >= ts, same key)."""
    from clinical_vector_search_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)],
        "k long, ts_ns long, lid long",
    )
    right = spark.createDataFrame(
        [(k, t, float(t)) for k, t in set(rights)],
        "k long, ts_ns long, value double",
    )
    rset = sorted(set(rights))
    for direction in ("backward", "forward"):
        got = {
            r.lid: r.asof_ts
            for r in asof_join(left, right, "k", direction=direction).collect()
        }
        for i, (k, t) in enumerate(lefts):
            if direction == "backward":
                cands = [rt for rk, rt in rset if rk == k and rt <= t]
                want = max(cands) if cands else None
            else:
                cands = [rt for rk, rt in rset if rk == k and rt >= t]
                want = min(cands) if cands else None
            assert got[i] == want, (direction, i, k, t, got[i], want)


@_slow
@given(
    st.text(
        alphabet=st.sampled_from("ab cd"),
        min_size=0,
        max_size=120,
    ),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=0, max_value=3),
)
def test_chunk_rows_covers_every_token(spark, text, size, overlap):
    """Chunking invariants for any text/size/overlap: concatenating chunks
    with the overlap removed reproduces the token stream exactly, and every
    chunk except the last has exactly `size` tokens."""
    if overlap >= size:
        overlap = size - 1
    from clinical_vector_search_spark.functions.text import chunk_rows

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = [
        (r.chunk_seq, r.chunk_text.split(), r.n_tokens)
        for r in chunk_rows(df, size, overlap).orderBy("chunk_seq").collect()
    ]
    toks = [t for t in text.lower().split() if t]
    if not toks:
        assert chunks == []
        return
    rebuilt: list[str] = []
    for seq, ctoks, n in chunks:
        assert len(ctoks) == n
        rebuilt.extend(ctoks if seq == 0 else ctoks[overlap:])
    assert rebuilt == toks
    for _seq, ctoks, _n in chunks[:-1]:
        assert len(ctoks) == size


@_slow
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(10**9), max_value=10**9),
            st.integers(min_value=-(10**9), max_value=10**9),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=12),  # bits
)
def test_zorder_key_matches_python_reference(spark, pts, bits):
    """For ANY point set and resolution, the Spark Morton key equals a
    pure-Python clamp -> quantize -> interleave reference."""
    from clinical_vector_search_spark.io.layout import zorder_key

    lo_x, hi_x = -1000, 999983  # non-power-of-two, negative lo
    lo_y, hi_y = 7, 5000
    nb = 1 << bits

    def ref(x, y):
        out = 0
        for i, (v, lo, hi) in enumerate(((x, lo_x, hi_x), (y, lo_y, hi_y))):
            v = max(lo, min(hi, v))
            q = min(nb - 1, (v - lo) * nb // (hi - lo + 1))
            for b in range(bits):
                out |= ((q >> b) & 1) << (b * 2 + i)
        return out

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "rid long, x long, y long",
    )
    key = zorder_key([("x", lo_x, hi_x), ("y", lo_y, hi_y)], bits=bits)
    got = {r.rid: r.z for r in df.select("rid", key.alias("z")).collect()}
    want = {i: ref(x, y) for i, (x, y) in enumerate(pts)}
    assert got == want


@_slow
@given(
    st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    st.integers(min_value=1, max_value=9),
)
def test_dense_row_ids_is_rank_for_any_keys(spark, keys, nparts):
    """For ANY unique key set and partition count, dense_row_ids assigns
    exactly the 1-based sort rank."""
    from clinical_vector_search_spark.functions.ids import dense_row_ids

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.row_id
           for r in dense_row_ids(df, ["k"], n_partitions=nparts).collect()}
    want = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == want


@_slow
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa bb", "cc dd", "ee ff", "gg hh", "II jj",
                             "kk LL mm", "nn oo", ""]),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_span_dedup_matches_python_reference(spark, docs_spans):
    """For ANY corpus built from a small span vocabulary (with case
    variation and empty spans), span_dedup must equal the brute-force
    first-occurrence reference."""
    import re

    from clinical_vector_search_spark.operators.dedup import span_dedup

    texts = [". ".join(s for s in spans) for spans in docs_spans]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )

    seen: set[str] = set()
    want = {}
    for i, text in enumerate(texts):
        kept = []
        for unit in re.split(r"\.\s+", text):
            if not unit.strip():
                continue
            k = unit.strip().lower()
            if k in seen:
                continue
            seen.add(k)
            kept.append(unit)
        want[i] = (len(kept), ". ".join(kept))

    got = {r.doc_id: (r.n_kept, r.text_dedup)
           for r in span_dedup(df).collect()}
    assert got == want


@_slow
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),               # user
            st.integers(min_value=0, max_value=30),              # ts
            st.sampled_from(["view", "click", "purchase", "x"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_matches_bruteforce_reference(spark, rows):
    """Greedy earliest-completion must agree with a brute-force
    subsequence-existence check on ANY event stream (duplicate
    timestamps, missing steps, interleaved users, noise events)."""
    from clinical_vector_search_spark.streaming.events import funnel

    steps = ["view", "click", "purchase"]
    ev = spark.createDataFrame(
        [(u, t * NS, s) for u, t, s in rows],
        "user_id long, ts_ns long, event_type string",
    )

    def reaches(user_events, upto):
        # exists e_1 < ... < e_upto with the required types, strict ts order
        t_prev = None
        for s in steps[:upto]:
            cands = [t for (t, typ) in user_events
                     if typ == s and (t_prev is None or t > t_prev)]
            if not cands:
                return False
            t_prev = min(cands)
        return True

    by_user: dict = {}
    for u, t, s in rows:
        by_user.setdefault(u, []).append((t, s))
    want = {
        i + 1: sum(1 for ue in by_user.values() if reaches(ue, i + 1))
        for i in range(len(steps))
    }
    got_w = {r.step_idx: r.n_users
             for r in funnel(ev, steps, strategy="window").collect()}
    got_l = {r.step_idx: r.n_users
             for r in funnel(ev, steps, strategy="levels").collect()}
    assert got_w == want
    assert got_l == want


@_slow
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # user
            st.integers(min_value=0, max_value=6),   # day
        ),
        min_size=1,
        max_size=30,
    )
)
def test_retention_matches_bruteforce_reference(spark, rows):
    """Cohort retention on ANY activity pattern must match a brute-force
    per-user first-day/offset reference."""
    from clinical_vector_search_spark.streaming.events import (
        retention_cohorts,
    )

    D = 86400
    ev = spark.createDataFrame(
        [(u, d * D * NS + 5) for u, d in rows], "user_id long, ts_ns long"
    )
    days: dict = {}
    for u, d in rows:
        days.setdefault(u, set()).add(d)
    firsts = {u: min(ds) for u, ds in days.items()}
    want: dict = {}
    for h in (1, 2):
        for u, ds in days.items():
            if firsts[u] + h in ds:
                key = (firsts[u], h)
                want[key] = want.get(key, 0) + 1
    sizes: dict = {}
    for u, f in firsts.items():
        sizes[f] = sizes.get(f, 0) + 1
    got = {(r.cohort_day, r.horizon): (r.n_users, r.n_active)
           for r in retention_cohorts(ev, [1, 2]).collect()}
    # densified contract: every (cohort, requested horizon) pair appears,
    # zero-return pairs with n_active = 0
    expect = {
        (f, h): (sizes[f], want.get((f, h), 0))
        for f in sizes
        for h in (1, 2)
    }
    assert got == expect


@_slow
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),              # key
            st.integers(min_value=0, max_value=20),             # ts
            st.sampled_from(["a", "b", "c"]),                   # state
        ),
        min_size=1,
        max_size=25,
    )
)
def test_scd2_from_scratch_matches_reference(spark, rows):
    """From-scratch SCD2 over ANY update stream must match a driver-side
    sort + consecutive-dedup + lead reference (same (ts, state) tie)."""
    from clinical_vector_search_spark.operators.temporal import scd2_merge

    empty = spark.createDataFrame(
        [], "k long, s string, valid_from long, valid_to long"
    )
    upd = spark.createDataFrame(rows, "k long, ts_ns long, s string")
    got = sorted(
        (r.k, r.s, r.valid_from, r.valid_to)
        for r in scd2_merge(
            empty, upd.select("k", "s", "ts_ns"), "k", ["s"]
        ).collect()
    )

    want = []
    by_key: dict = {}
    for k, t, s in rows:
        by_key.setdefault(k, []).append((t, s))
    for k, evs in by_key.items():
        evs = sorted(set(evs))  # (ts, state) tie order; dups collapse anyway
        kept = []
        for t, s in evs:
            if not kept or kept[-1][1] != s:
                kept.append((t, s))
        for i, (t, s) in enumerate(kept):
            vt = kept[i + 1][0] if i + 1 < len(kept) else None
            want.append((k, s, t, vt))
    assert got == sorted(want)


@_slow
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # group
            st.integers(min_value=0, max_value=9),   # score (ties likely)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_topk_per_group_matches_bruteforce(spark, rows):
    """Both strategies must equal a brute-force per-group sort on ANY
    input, including heavy ties (id is the tiebreak) and k > group
    size."""
    from clinical_vector_search_spark.operators.skew import topk_per_group

    data = [(g, i, s) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "g long, id long, score long"
    ).repartition(3)
    k = 3
    by_g: dict = {}
    for g, i, s in data:
        by_g.setdefault(g, []).append((-s, i))
    want = set()
    for g, items in by_g.items():
        for rank, (_, i) in enumerate(sorted(items)[:k], start=1):
            want.add((g, i, rank))
    spec = [("score", False), ("id", True)]
    for strat in ("window", "partial"):
        got = {(r.g, r.id, r.rank)
               for r in topk_per_group(df, ["g"], spec, k,
                                       strategy=strat).collect()}
        assert got == want, strat


@_slow
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),               # key
            st.integers(min_value=0, max_value=20),              # ts
            st.sampled_from(["a", "b", "c"]),                    # state
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=0, max_value=20),                      # cut
)
def test_scd2_two_step_merge_equals_one_shot(spark, rows, cut):
    """The merge identity behind events_scd2_merge: for ANY update
    stream and ANY time cut, scd2(scd2(∅, before), after) must equal
    scd2(∅, all) — closed-version passthrough and open-version
    re-sequencing composed correctly."""
    from clinical_vector_search_spark.operators.temporal import scd2_merge

    empty = spark.createDataFrame(
        [], "k long, s string, valid_from long, valid_to long"
    )
    upd = spark.createDataFrame(rows, "k long, ts_ns long, s string")

    def hist(df):
        return sorted(
            (r.k, r.s, r.valid_from, r.valid_to) for r in df.collect()
        )

    one_shot = hist(scd2_merge(empty, upd, "k", ["s"]))
    first = upd.filter(F.col("ts_ns") < cut)
    second = upd.filter(F.col("ts_ns") >= cut)
    if first.count() == 0:
        current = empty
    else:
        current = scd2_merge(empty, first, "k", ["s"])
    two_step = hist(scd2_merge(current, second, "k", ["s"]))
    assert two_step == one_shot


@_slow
@given(
    st.text(alphabet=st.sampled_from("ab cd"), min_size=0, max_size=150),
    st.integers(min_value=2, max_value=5),   # w
    st.integers(min_value=2, max_value=8),   # divisor
)
def test_cdc_chunks_reconstruct_and_shift_robust(spark, text, w, divisor):
    """CDC invariants for ANY text: chunks concatenate back to the exact
    token stream; prepending a token changes only a bounded PREFIX of
    chunk hashes (boundaries after the first cut ≥ the shift point are
    content-defined, so the interior survives)."""
    from clinical_vector_search_spark.functions.text import cdc_chunk_rows

    df = spark.createDataFrame(
        [(0, text), (1, "zz " + text)], "doc_id long, text string"
    )
    rows = cdc_chunk_rows(df, w=w, divisor=divisor).collect()
    by_doc: dict = {0: [], 1: []}
    for r in rows:
        by_doc[r.doc_id].append((r.chunk_seq, r.chunk_text, r.chunk_hash))
    toks = [t for t in text.lower().split() if t]
    chunks0 = [c for _, c, _ in sorted(by_doc[0])]
    rebuilt = [t for c in chunks0 for t in c.split()]
    assert rebuilt == toks
    if not toks:
        assert chunks0 == []
        return
    # shift robustness: every chunk of doc0 that starts at/after doc0's
    # FIRST cut must reappear in shifted doc1 (identical hash)
    h1 = {h for _, _, h in by_doc[1]}
    for seq, _c, h in sorted(by_doc[0])[1:]:
        assert h in h1, (seq, _c)


@_slow
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1, max_value=1, allow_nan=False,
                      width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=20,
    )
)
def test_semantic_dedup_matches_numpy_reference(spark, vecs):
    """Cluster assignment (argmax dot, first-max tie), within-cluster
    pair set, and smallest-id-keeper survivors must match a NumPy
    re-implementation for ANY small vector set."""
    import numpy as np

    from clinical_vector_search_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_pairs,
    )
    from clinical_vector_search_spark.operators.knn import _centroid_matrix

    dim, k, thr = 4, 4, 0.9
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents = np.array(_centroid_matrix(dim, k))
    X = np.array(vecs, dtype="float64")
    Xn = X / (np.sqrt((X * X).sum(axis=1, keepdims=True)) + 1e-9)
    dots = Xn @ cents.T
    # quantize-before-argmax (knn.ASSIGN_SCALE): ties → first max =
    # smallest cluster id, the cross-engine contract
    assign = np.floor(dots * 1e12 + 0.5).argmax(axis=1)
    from hypothesis import assume

    want_pairs = set()
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            cos = float(Xn[i] @ Xn[j])
            # discard examples sitting on the threshold within float
            # noise — numpy matmul vs the Spark fold may differ in the
            # last ulp, and the CONTRACT under test is the set logic,
            # not which side of an exact tie a ulp lands on
            assume(abs(cos - thr) > 1e-9)
            if assign[i] == assign[j] and cos >= thr:
                want_pairs.add((i, j))
    got_pairs = {
        (r.a_id, r.b_id)
        for r in semantic_dedup_pairs(df, dim, thr, k).collect()
    }
    assert got_pairs == want_pairs
    pruned = {b for _, b in want_pairs}
    want_surv = {i: int(assign[i]) for i in range(len(vecs)) if i not in pruned}
    got_surv = {r.vec_id: r.cluster
                for r in semantic_dedup(df, dim, thr, k).collect()}
    assert got_surv == want_surv


def test_semantic_dedup_zero_sum_tie_regression(spark):
    """r8 Hypothesis falsifying example, committed explicitly
    (.hypothesis/ is git-ignored): under the former affine LCG centroid
    matrix every centroid row was an arithmetic ramp with the same step,
    so ZERO-SUM vectors produced exact k-way dot ties that NumPy BLAS and
    the Spark expression fold resolved differently (argmax 2 vs 0). The
    md5 centroid matrix + quantize-before-argmax rule must keep Spark
    and the NumPy reference in exact agreement on these inputs."""
    import numpy as np

    from clinical_vector_search_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_pairs,
    )
    from clinical_vector_search_spark.operators.knn import _centroid_matrix

    vecs = [
        [-1.0, 0.0, 0.5, 0.0],
        [-0.3333333432674408, 0.0, 0.3333333432674408, 0.0],
    ]
    dim, k, thr = 4, 4, 0.9
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents = np.array(_centroid_matrix(dim, k))
    X = np.array(vecs, dtype="float64")
    Xn = X / (np.sqrt((X * X).sum(axis=1, keepdims=True)) + 1e-9)
    assign = np.floor(Xn @ cents.T * 1e12 + 0.5).argmax(axis=1)
    want_pairs = set()
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            if assign[i] == assign[j] and float(Xn[i] @ Xn[j]) >= thr:
                want_pairs.add((i, j))
    got_pairs = {
        (r.a_id, r.b_id)
        for r in semantic_dedup_pairs(df, dim, thr, k).collect()
    }
    assert got_pairs == want_pairs
    pruned = {b for _, b in want_pairs}
    want_surv = {
        i: int(assign[i]) for i in range(len(vecs)) if i not in pruned
    }
    got_surv = {
        r.vec_id: r.cluster for r in semantic_dedup(df, dim, thr, k).collect()
    }
    assert got_surv == want_surv


def test_incremental_agg_update_random_matches_recompute(spark):
    """Randomized (seeded) change feeds: delta maintenance must equal a
    from-scratch recompute of old − removed + added, for any mix of
    touched/untouched/emptied/new groups."""
    import random

    from clinical_vector_search_spark.operators.audit import (
        incremental_agg_update,
    )

    rng = random.Random(42)
    groups = [f"g{i}" for i in range(12)]
    old = [(rng.choice(groups), float(rng.randint(-50, 50)))
           for _ in range(300)]
    removed = rng.sample(old, 80)              # true subset of old rows
    added = [(rng.choice(groups + ["brand_new"]),
              float(rng.randint(-50, 50))) for _ in range(60)]

    base = spark.createDataFrame(old, "g string, v double")
    base_agg = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("v")
    )
    got = {
        r.g: (r.n_rows, round(r.v, 6))
        for r in incremental_agg_update(
            base_agg,
            spark.createDataFrame(added, "g string, v double"),
            spark.createDataFrame(removed, "g string, v double"),
            ["g"],
            ["v"],
        ).collect()
    }

    from collections import Counter, defaultdict

    cnt: Counter = Counter()
    sm: dict = defaultdict(float)
    for g, v in old + added:
        cnt[g] += 1
        sm[g] += v
    for g, v in removed:
        cnt[g] -= 1
        sm[g] -= v
    want = {g: (n, round(sm[g], 6)) for g, n in cnt.items() if n > 0}
    assert got == want


def test_time_weighted_avg_random_matches_bruteforce(spark):
    """Seeded random irregular series: TWA equals the O(n) single-node
    reference per group (ties on ts included)."""
    import random

    from clinical_vector_search_spark.streaming.events import (
        time_weighted_avg,
    )

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(15):
        n = rng.randint(1, 30)
        ts = 0
        for _ in range(n):
            ts += rng.choice([0, 1, 5, 60]) * 1_000_000_000
            rows.append((eid, u, ts, float(rng.randint(-10, 10))))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ns long, value double"
    )
    got = {r.user_id: (r.n_events, r.span_ns, r.twa)
           for r in time_weighted_avg(df).collect()}

    from collections import defaultdict

    per: dict = defaultdict(list)
    for e, u, t, v in rows:
        per[u].append((t, e, v))
    want = {}
    for u, evs in per.items():
        evs.sort()
        span = evs[-1][0] - evs[0][0]
        if span <= 0:
            continue
        num = sum(v * (evs[i + 1][0] - t)
                  for i, (t, _e, v) in enumerate(evs[:-1]))
        want[u] = (len(evs), span, round(num / span, 6))
    assert got == want


def test_jaccard_prefix_random_heavy_hitters(spark):
    """Seeded random corpora WITH corpus-universal tokens (the regime the
    prefix filter exists for): prefix path == full postings join at
    thresholds around the float-fragile values."""
    import random

    from clinical_vector_search_spark.operators.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    rng = random.Random(99)
    boiler = [f"b{i}" for i in range(5)]
    docs = []
    for i in range(60):
        toks = list(boiler) + [
            f"t{rng.randint(0, 40)}" for _ in range(rng.randint(3, 12))
        ]
        rng.shuffle(toks)
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for tau in (0.4, 0.5, 0.8):
        full = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in ngram_jaccard_pairs(df, 1, tau).collect()
        }
        pref = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in jaccard_prefix_pairs(df, 1, tau).collect()
        }
        assert pref == full, f"tau={tau}"
        if tau == 0.4:
            assert full  # heavy boilerplate guarantees low-tau pairs


