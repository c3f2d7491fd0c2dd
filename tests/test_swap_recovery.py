"""Mid-swap crash self-heal + single-writer compaction lease.

The move-aside swap (`io.tables._swap_directories`) has a documented
window between its two renames where the live directory NAME is absent.
These tests kill a compaction inside that window (by injecting a crash
into the second `fs.rename`) and prove the next read / compaction heals
it automatically (`recover_interrupted_swap`), that ambiguity refuses
loudly, and that `compaction_lease` gives two concurrent writers one
winner and one loud error (with the stale-lease override knob).
"""
from __future__ import annotations

import glob
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

import clinical_vector_search_spark.io.tables as T


class _CrashOnSecondRename:
    """Wraps a Hadoop FileSystem; the shared counter spans the proxies
    minted for each `_hadoop_fs` call, so the SECOND rename seen during
    the whole compaction — i.e. the swap's rename of tmp into the live
    name, right after the live dir moved aside — raises."""

    def __init__(self, fs, state):
        self._fs = fs
        self._state = state

    def rename(self, src, dst):
        self._state["renames"] += 1
        if self._state["renames"] == 2:
            raise RuntimeError("injected crash between the two renames")
        return self._fs.rename(src, dst)

    def __getattr__(self, name):
        return getattr(self._fs, name)


def _crash_mid_swap(spark, path, monkeypatch, recursive=False):
    """Run compact_parquet on `path` with the injected mid-swap crash;
    return after asserting the crash left the documented state."""
    real = T._hadoop_fs
    state = {"renames": 0}

    def crashy(s, p):
        jvm, fs, jp = real(s, p)
        return jvm, _CrashOnSecondRename(fs, state), jp

    with monkeypatch.context() as m:
        m.setattr(T, "_hadoop_fs", crashy)
        with pytest.raises(RuntimeError, match="injected crash"):
            T.compact_parquet(
                spark, path, target_file_bytes=64 << 20, recursive=recursive
            )
    # live name absent, data stranded at exactly one __old_<tag>
    assert not os.path.exists(path)
    assert len(glob.glob(path + "__old_*")) == 1
    # ordinary failures release the lease (finally), so heal is unattended
    assert not os.path.exists(T._lease_path(path))


def test_mid_swap_crash_heals_on_next_read(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "codes")
    df = spark.range(200).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 7).cast("int").alias("cluster"),
    )
    df.repartition(8).write.parquet(path)
    want = sorted((r.vec_id, r.cluster) for r in df.collect())

    _crash_mid_swap(spark, path, monkeypatch)

    # the serving reader self-heals (rename back through Hadoop FS) and
    # returns the pre-swap data unchanged
    from clinical_vector_search_spark.operators.pq import read_ivfpq_index

    healed = read_ivfpq_index(spark, path)
    assert sorted((r.vec_id, r.cluster) for r in healed.collect()) == want
    assert os.path.exists(path)
    assert glob.glob(path + "__old_*") == []
    # the never-published temp copy was cleared by the recovery
    assert glob.glob(path + "__compact_*") == []


def test_mid_swap_crash_heals_on_next_compaction(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "data")
    spark.range(300).repartition(10).write.parquet(path)
    want = sorted(r.id for r in spark.read.parquet(path).collect())

    _crash_mid_swap(spark, path, monkeypatch)

    # re-running the compaction (unpatched) heals, then compacts
    n = T.compact_parquet(spark, path, target_file_bytes=64 << 20)
    assert n == 1
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == want
    assert glob.glob(path + "__old_*") == []


def test_bm25_read_heals_crashed_stat_directory(spark, tmp_path, monkeypatch):
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_index_add,
        bm25_read_index,
    )

    rows = [(i, f"alpha tok{i % 5} bravo tok{i % 3}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "bm25")
    bm25_index_add(spark, docs, 0, idx)

    _crash_mid_swap(spark, f"{idx}/postings", monkeypatch, recursive=True)

    def snap(df):
        return sorted(
            (r.doc, r.term, r.tf, round(r.idf, 10)) for r in df.collect()
        )

    assert snap(bm25_read_index(spark, idx)) == snap(bm25_index(docs))
    assert os.path.exists(f"{idx}/postings")


def test_recovery_refuses_ambiguous_old_dirs(spark, tmp_path):
    path = str(tmp_path / "amb")
    spark.range(5).write.parquet(path + "__old_aaaa1111")
    spark.range(5).write.parquet(path + "__old_bbbb2222")
    with pytest.raises(IOError, match="MULTIPLE"):
        T.recover_interrupted_swap(spark, path)
    # both copies untouched for the human to inspect
    assert len(glob.glob(path + "__old_*")) == 2


def test_recovery_noop_on_live_or_fresh_path(spark, tmp_path):
    live = str(tmp_path / "live")
    spark.range(5).write.parquet(live)
    assert T.recover_interrupted_swap(spark, live) is False
    assert T.recover_interrupted_swap(spark, str(tmp_path / "never")) is False
    # deep mode completes a crashed swap's final delete: a lingering
    # __old NEXT TO a live dir is the superseded pre-swap copy
    spark.range(5).write.parquet(live + "__old_cafe0123")
    assert T.recover_interrupted_swap(spark, live, deep=True) is False
    assert glob.glob(live + "__old_*") == []


def test_fresh_absent_path_recovery_is_lease_free(spark, tmp_path):
    """The common serving-read case — an index's not-yet-created
    `deleted/` directory — must produce ZERO lease traffic: nothing to
    heal, so concurrent readers of an absent directory never contend
    (r13 review finding). Proven by pre-creating a foreign lease file:
    a recovery that touched the lease would either raise LeaseHeldError
    or delete it."""
    path = str(tmp_path / "never_created")
    with open(T._lease_path(path), "w") as f:
        f.write("{}")
    assert T.recover_interrupted_swap(spark, path) is False
    assert os.path.exists(T._lease_path(path))  # untouched


def test_reader_waits_out_a_racing_healer(spark, tmp_path, monkeypatch):
    """Two readers hitting the crashed state concurrently: the loser of
    the lease race must WAIT for the live name to reappear (the winner
    heals in ms) instead of failing the read with LeaseHeldError."""
    path = str(tmp_path / "raced")
    spark.range(20).write.parquet(path + "__old_feed1234")

    def healer():
        time.sleep(1.0)
        os.rename(path + "__old_feed1234", path)
        os.remove(T._lease_path(path))

    # simulate the racing winner: it already holds the lease and will
    # finish the rename shortly
    with open(T._lease_path(path), "w") as f:
        f.write('{"pid": 1}')
    t = threading.Thread(target=healer)
    t.start()
    try:
        assert T.recover_interrupted_swap(spark, path) is False
    finally:
        t.join(timeout=30)
    assert os.path.exists(path)


def test_concurrent_compactions_one_winner_one_loud_error(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "contended")
    spark.range(500).repartition(10).write.parquet(path)
    want = sorted(r.id for r in spark.read.parquet(path).collect())

    entered, release = threading.Event(), threading.Event()
    real_dir_bytes = T._dir_bytes

    def parked(s, p):
        # first writer holds the lease here until the loser has failed
        entered.set()
        assert release.wait(timeout=60)
        return real_dir_bytes(s, p)

    results: dict[str, object] = {}

    def winner():
        try:
            results["n"] = T.compact_parquet(path=path, spark=spark)
        except Exception as e:  # pragma: no cover — surfaced by asserts
            results["n"] = e

    with monkeypatch.context() as m:
        m.setattr(T, "_dir_bytes", parked)
        t = threading.Thread(target=winner)
        t.start()
        assert entered.wait(timeout=60)
        # second writer: refused LOUDLY at lease acquisition, before any
        # rename could interleave with the winner's swap
        with pytest.raises(IOError, match="lease.*already held"):
            T.compact_parquet(spark, path)
        release.set()
        t.join(timeout=300)
    assert results["n"] == 1
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == want
    assert not os.path.exists(T._lease_path(path))


def test_stale_lease_override_knob(spark, tmp_path):
    path = str(tmp_path / "stale")
    spark.range(50).repartition(5).write.parquet(path)
    with open(T._lease_path(path), "w", encoding="utf-8") as f:
        f.write('{"pid": 0, "host": "dead", "acquired_unix": 0}')
    time.sleep(0.2)
    # default: a stranded lease (hard-killed writer) refuses loudly …
    with pytest.raises(IOError, match="lease.*already held"):
        T.compact_parquet(spark, path)
    # … and the override knob breaks it once it is older than the bound
    assert (
        T.compact_parquet(spark, path, break_stale_lease_after_sec=0.1) == 1
    )
    assert not os.path.exists(T._lease_path(path))


def test_batch_write_refused_while_compaction_lease_held(spark, tmp_path):
    """The ingest-during-compaction data-loss race (r13): a batch
    subdirectory written while the compactor is mid-run lands in the
    directory the swap deletes. Every batch-id-overwrite sink calls
    guard_batch_not_compacted, which now refuses LOUDLY while the
    lease is held and proceeds once it clears."""
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_index_add,
        bm25_read_index,
    )

    rows = [(0, "alpha bravo"), (1, "bravo charlie")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "bm25")
    bm25_index_add(spark, docs.filter(F.col("doc_id") == 0), 0, idx)
    # a compactor holds the postings lease
    with open(T._lease_path(f"{idx}/postings"), "w") as f:
        f.write('{"pid": 1}')
    with pytest.raises(IOError, match="refused.*lease|lease.*refused"):
        bm25_index_add(spark, docs.filter(F.col("doc_id") == 1), 1, idx)
    os.remove(T._lease_path(f"{idx}/postings"))
    # redelivery after the lease clears lands the batch (idempotent sink)
    bm25_index_add(spark, docs.filter(F.col("doc_id") == 1), 1, idx)

    def snap(df):
        return sorted((r.doc, r.term, r.tf) for r in df.collect())

    assert snap(bm25_read_index(spark, idx)) == snap(bm25_index(docs))


def test_compaction_refused_while_ingest_marker_live(spark, tmp_path):
    """Reverse direction of the ingest guard: a compaction arriving
    while a batch write is in flight (live marker under
    `<path>__INGEST_MARKERS`) must refuse loudly — its swap would
    silently delete the subdirectory being written. The stale knob
    clears a crashed ingest's marker and proceeds."""
    path = str(tmp_path / "stats")
    spark.range(10).repartition(2).write.parquet(f"{path}/batch-0")
    os.makedirs(T._marker_dir(path))
    with open(os.path.join(T._marker_dir(path), "m-live"), "w") as f:
        f.write("")
    with pytest.raises(IOError, match="in flight"):
        T.compact_batched(spark, path)
    # lease was released despite the refusal
    assert not os.path.exists(T._lease_path(path))
    time.sleep(0.2)
    assert (
        T.compact_batched(spark, path, break_stale_lease_after_sec=0.1) >= 1
    )
    # the stale knob cleared the crashed marker AND the deep pass pruned
    # the now-empty marker directory itself (r14 hygiene)
    assert not os.path.exists(T._marker_dir(path))


def test_ingest_aborts_when_compactor_slips_between_announce_and_recheck(
    spark, tmp_path, monkeypatch
):
    """The ingest_markers handshake: check lease → announce markers →
    RE-check lease. A compactor acquiring the lease between the two
    checks listed markers before ours existed, so the ingest must abort
    loudly (markers removed) and let the redelivery retry."""
    path = str(tmp_path / "d")
    real = T.guard_no_compaction_in_flight
    calls = {"n": 0}

    def compactor_slips_in(p, s=None):
        calls["n"] += 1
        if calls["n"] == 2:  # between announce and recheck
            with open(T._lease_path(path), "w") as f:
                f.write('{"pid": 9}')
        return real(p, s)

    with monkeypatch.context() as m:
        m.setattr(T, "guard_no_compaction_in_flight", compactor_slips_in)
        with pytest.raises(IOError, match="refused"):
            with T.ingest_markers(spark, [path]):
                raise AssertionError("must not reach the writes")
    os.remove(T._lease_path(path))
    assert os.listdir(T._marker_dir(path)) == []  # cleaned up on abort


def test_fence_tmp_fragment_is_ignored(spark, tmp_path):
    """A crash mid-fragment-write leaves only a hidden .fence-…tmp —
    the union read skips it instead of dying on partial JSON, and a
    re-run publishes the real fragment by rename."""
    path = str(tmp_path / "fenced")
    mdir = T._manifest_dir(path)
    os.makedirs(mdir)
    with open(os.path.join(mdir, ".fence-deadbeef.json.tmp"), "w") as f:
        f.write('["batch-0", "batc')  # torn mid-write
    assert T.compacted_batches(path, spark) == set()
    T.record_compacted_batches(spark, path, ["batch-0", "batch-1"])
    assert T.compacted_batches(path, spark) == {"batch-0", "batch-1"}
    frags = os.listdir(mdir)
    assert all(f.startswith((".", "fence-")) for f in frags)


def test_bm25_redelete_fence_survives_ancestor_named_like_batch(
    spark, tmp_path
):
    """Regression (r12 advice): the re-delete fence excluded the batch's
    own tombstones by URI substring containment, so an index rooted
    under an ANCESTOR directory named exactly like the delete subdir
    (here `del-0`) matched every tombstone file and silently disabled
    the fence — re-deleting an already-deleted doc double-subtracted
    df/n_docs/sum_dl. The parent-directory exact match keeps the fence
    live regardless of where the index is rooted."""
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_index_add,
        bm25_index_delete,
        bm25_read_index,
    )

    rows = [
        (0, "alpha bravo charlie"),
        (1, "alpha delta echo"),
        (2, "bravo echo foxtrot golf"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "del-0" / "idx")  # ancestor named like dsub
    bm25_index_add(spark, docs, 0, idx)
    bm25_index_delete(spark, docs.filter(F.col("doc_id") == 1), 0, idx)

    def snap(df):
        return sorted(
            (
                r.doc, r.term, r.tf, r.dl,
                round(r.idf, 10), r.n_docs, round(r.avgdl, 10),
            )
            for r in df.collect()
        )

    want = snap(bm25_index(docs.filter(F.col("doc_id") != 1)))
    assert snap(bm25_read_index(spark, idx)) == want
    # fresh-batch re-delete of the same doc: still a no-op (the fence
    # sees the existing tombstones despite the `del-0` ancestor)
    bm25_index_delete(spark, docs.filter(F.col("doc_id") == 1), 1, idx)
    assert snap(bm25_read_index(spark, idx)) == want
    # and the same-id retry still works (own tombstones excluded by
    # parent-dir match, not erased by the ancestor name)
    bm25_index_delete(spark, docs.filter(F.col("doc_id") == 1), 1, idx)
    assert snap(bm25_read_index(spark, idx)) == want


# --------------------------------------------------------------------------
# r14: stale-break race hardening, payload-verified release, marker/lease
# hygiene, and the tombstone-listing-under-lease fix
# --------------------------------------------------------------------------


class _AgedFirstStatus:
    """FileSystem proxy whose FIRST getFileStatus reports an mtime old
    enough to look stale — simulating the race where the lease measured
    stale is replaced by a FRESH one (another breaker broke + re-claimed)
    before our rename lands."""

    def __init__(self, fs, state):
        self._fs = fs
        self._state = state

    def getFileStatus(self, p):
        st = self._fs.getFileStatus(p)
        self._state["calls"] += 1
        if self._state["calls"] == 1:
            real = st

            class _Aged:
                def getModificationTime(self):
                    return real.getModificationTime() - 3_600_000

                def __getattr__(self, name):
                    return getattr(real, name)

            return _Aged()
        return st

    def __getattr__(self, name):
        return getattr(self._fs, name)


def test_stale_break_does_not_steal_fresh_lease(spark, tmp_path, monkeypatch):
    """Breaker B measures the old lease stale, but by rename time the
    file at jlock is a FRESH lease (breaker A broke and re-claimed
    first). B must detect the freshness on the renamed file, restore
    it, and raise LeaseHeldError — never proceed with A's lease gone."""
    path = str(tmp_path / "d")
    spark.range(10).write.parquet(path)
    with open(T._lease_path(path), "w", encoding="utf-8") as f:
        f.write('{"pid": 424242, "host": "fresh-holder"}')
    real = T._hadoop_fs
    state = {"calls": 0}

    def aged(s, p):
        jvm, fs, jp = real(s, p)
        return jvm, _AgedFirstStatus(fs, state), jp

    with monkeypatch.context() as m:
        m.setattr(T, "_hadoop_fs", aged)
        with pytest.raises(T.LeaseHeldError, match="re-claimed"):
            with T.compaction_lease(spark, path, break_stale_after_sec=60):
                raise AssertionError("must not acquire over a fresh lease")
    # the fresh holder's lease survived, content intact
    with open(T._lease_path(path), encoding="utf-8") as f:
        assert "fresh-holder" in f.read()
    assert not glob.glob(T._lease_path(path) + ".broken-*")


def test_release_leaves_foreign_lease_alone(spark, tmp_path):
    """The finally-release deletes only OUR lease: if a stale-breaker
    replaced it mid-run, the new holder's lease must survive our exit."""
    path = str(tmp_path / "d")
    spark.range(5).write.parquet(path)
    with T.compaction_lease(spark, path):
        os.remove(T._lease_path(path))  # a breaker cleared ours …
        with open(T._lease_path(path), "w", encoding="utf-8") as f:
            f.write('{"pid": 777, "host": "new-holder"}')  # … and claimed
    with open(T._lease_path(path), encoding="utf-8") as f:
        assert "new-holder" in f.read()
    os.remove(T._lease_path(path))


def test_claim_io_error_not_masked_as_lease_held():
    """'does not exist'-style create failures (missing parent path etc.)
    must propagate as IO errors, not convert into 'lease already held'."""

    class _MissingParentFS:
        def create(self, p, overwrite):
            raise Exception("File does not exist: /gone/parent")

    class _HeldFS:
        def create(self, p, overwrite):
            raise Exception(
                "org.apache.hadoop.fs.FileAlreadyExistsException: lock"
            )

    with pytest.raises(Exception, match="does not exist"):
        T._try_claim_lease(_MissingParentFS(), None, b"x")
    assert T._try_claim_lease(_HeldFS(), None, b"x") is False


def test_empty_marker_dir_pruned_by_deep_pass(spark, tmp_path):
    """Every ingest_markers exit removes its marker FILES but left the
    directory behind forever; the compactor's deep pass now prunes it
    when empty (and only when empty)."""
    path = str(tmp_path / "d")
    spark.range(20).repartition(4).write.parquet(path)
    os.makedirs(T._marker_dir(path))
    assert T.compact_parquet(spark, path) >= 1
    assert not os.path.exists(T._marker_dir(path))
    # non-empty marker dir: guard refuses first, directory untouched
    os.makedirs(T._marker_dir(path))
    with open(os.path.join(T._marker_dir(path), "m-live"), "w") as f:
        f.write("")
    with pytest.raises(IOError, match="in flight"):
        T.compact_parquet(spark, path)
    assert os.path.exists(os.path.join(T._marker_dir(path), "m-live"))


def test_ingest_markers_touch_keeps_liveness(spark, tmp_path):
    """The yielded touch() re-stamps marker mtimes so a long legitimate
    ingest stays distinguishable from a crashed one."""
    path = str(tmp_path / "d")
    with T.ingest_markers(spark, [path]) as touch:
        (marker,) = [
            n for n in os.listdir(T._marker_dir(path)) if n.startswith("m-")
        ]
        mpath = os.path.join(T._marker_dir(path), marker)
        old_ms = os.path.getmtime(mpath)
        os.utime(mpath, (old_ms - 3600, old_ms - 3600))  # simulate age
        touch()
        assert os.path.getmtime(mpath) >= old_ms - 1
    assert os.listdir(T._marker_dir(path)) == []


def test_maintenance_state_reports_all_four_sources(spark, tmp_path):
    """maintenance_state folds lease / markers / __old siblings / fence
    into one read-only dict, and the refusal messages render it."""
    path = str(tmp_path / "d")
    spark.range(5).write.parquet(path)
    with open(T._lease_path(path), "w", encoding="utf-8") as f:
        f.write('{"pid": 5, "host": "h", "acquired_unix": 0}')
    os.makedirs(T._marker_dir(path))
    with open(os.path.join(T._marker_dir(path), "m-x"), "w") as f:
        f.write("")
    os.makedirs(path + "__old_dead")
    T.record_compacted_batches(spark, path, ["batch-0"])
    s = T.maintenance_state(spark, path)
    assert s["path_exists"] is True
    assert s["lease"]["holder"]["pid"] == 5
    assert s["lease"]["age_sec"] >= 0
    assert [m["name"] for m in s["markers"]] == ["m-x"]
    assert s["old_siblings"] and s["old_siblings"][0].endswith("__old_dead")
    assert s["fenced_batches"] == ["batch-0"]
    # and the refusal message carries the rendered state
    with pytest.raises(T.LeaseHeldError, match="state:.*m-x"):
        T.guard_no_compaction_in_flight(path, spark)


def test_tombstone_batch_committed_before_lease_is_not_lost(
    spark, tmp_path, monkeypatch
):
    """compact_tombstoned must snapshot the tombstone LISTING under the
    lease: a delete batch committed between the lease-free probe and
    the lease acquisition was previously absent from the anti-join yet
    still wiped by the clear-LAST delete — a silently resurrected doc."""
    data = str(tmp_path / "data")
    tomb = str(tmp_path / "tomb")
    spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long"
    ).write.parquet(f"{data}/batch-0")
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(
        f"{tomb}/del-0"
    )
    real = T.compaction_lease

    class _LateTombstone:
        """Wraps the lease context: right after acquisition, a racing
        delete batch commits (it passed its own guards before we held
        the lease)."""

        def __init__(self, cm):
            self._cm = cm

        def __enter__(self):
            r = self._cm.__enter__()
            spark.createDataFrame([(2,)], "doc_id long").write.parquet(
                f"{tomb}/del-late"
            )
            return r

        def __exit__(self, *a):
            return self._cm.__exit__(*a)

    def lease_then_late(s, p, b=None):
        # inject on the DATA-path lease only: after it but before the
        # tombstone-path lease is exactly the window where a delete
        # writer can still commit (its guards watch the tombstone
        # lease, which is not yet held)
        if p == data:
            return _LateTombstone(real(s, p, b))
        return real(s, p, b)

    with monkeypatch.context() as m:
        m.setattr(T, "compaction_lease", lease_then_late)
        assert T.compact_tombstoned(spark, data, tomb, "doc_id") >= 1
    survivors = sorted(
        r.doc_id for r in spark.read.parquet(data).collect()
    )
    assert survivors == [0, 3, 4, 5, 6, 7, 8, 9]  # BOTH 1 and 2 erased
    assert not os.path.exists(tomb)  # cleared, with no delete lost


def test_delete_writer_refused_while_tombstone_lease_held(spark, tmp_path):
    """The clear-LAST race (r14 review): compact_tombstoned/reindex now
    hold the TOMBSTONE path's lease for their whole run, so a delete
    batch arriving mid-job refuses loudly instead of committing a
    tombstone the clear-LAST delete silently wipes (a resurrected
    doc)."""
    from clinical_vector_search_spark.operators.pq import (
        ivfpq_index_delete,
    )

    tomb = str(tmp_path / "dead")
    with open(T._lease_path(tomb), "w", encoding="utf-8") as f:
        f.write('{"pid": 1, "host": "compactor"}')
    ids = spark.createDataFrame([(1,)], "vec_id long")
    with pytest.raises(T.LeaseHeldError):
        ivfpq_index_delete(spark, ids, 0, tomb)
    assert not os.path.exists(tomb)  # nothing committed
    os.remove(T._lease_path(tomb))
    ivfpq_index_delete(spark, ids, 0, tomb)  # retry after clear: lands
    assert os.path.exists(tomb)


def test_compact_tombstoned_holds_tombstone_lease_for_whole_job(
    spark, tmp_path, monkeypatch
):
    """compact_tombstoned must hold the tombstone path's lease from
    before the listing snapshot until after the clear-LAST delete —
    the delete writers' guards check THAT lease, not the data path's."""
    data = str(tmp_path / "data")
    tomb = str(tmp_path / "tomb")
    spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long"
    ).write.parquet(f"{data}/batch-0")
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(
        f"{tomb}/del-0"
    )
    seen = {}
    real = T._rewrite_and_swap

    def spy(df, path, tb, sidecar=None):
        seen["tomb_lease_during_rewrite"] = os.path.exists(
            T._lease_path(tomb)
        )
        return real(df, path, tb, sidecar)

    with monkeypatch.context() as m:
        m.setattr(T, "_rewrite_and_swap", spy)
        assert T.compact_tombstoned(spark, data, tomb, "doc_id") >= 1
    assert seen["tomb_lease_during_rewrite"] is True
    # both leases released afterwards
    assert not os.path.exists(T._lease_path(tomb))
    assert not os.path.exists(T._lease_path(data))
