"""The pointer-file publication layout (io/tables.py versioned_publish
— r15): the object-store answer to the crash protocol's one platform
assumption. The move-aside swap (_swap_directories) relies on atomic
DIRECTORY rename — local/HDFS semantics; object stores implement rename
as N copies + N deletes, leaving a long window where the live name is
absent or partial. The versioned layout needs only one atomic
SINGLE-SMALL-FILE replace (a PUT on S3-like stores), which every store
gives: each publish writes a complete immutable v-<n>/ directory, then
flips the _CURRENT pointer. These tests walk every crash point and an
emulated rename-less (copy+delete) directory swap to show the pointer
layout serves a complete dataset at every instant where the in-place
swap would not."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_vector_search_spark.io.tables import (
    VERSION_POINTER,
    _atomic_small_file,
    current_version,
    read_versioned,
    upsert_vector_index_versioned,
    versioned_publish,
)


def _frame(spark, tag, n=20):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(tag).alias("payload")
    )


def _snap(df):
    return sorted((r.doc_id, r.payload) for r in df.collect())


def test_publish_read_bump_and_prune(spark, tmp_path):
    """Round trip; each publish bumps the version and the reader
    follows the pointer; keep=2 retains exactly current+predecessor
    (the in-flight-reader grace window), pruning older versions."""
    import os

    base = str(tmp_path / "idx")
    v1 = versioned_publish(_frame(spark, "a"), base)
    assert v1 == "v-000001" and current_version(spark, base) == v1
    assert _snap(read_versioned(spark, base)) == _snap(_frame(spark, "a"))
    v2 = versioned_publish(_frame(spark, "b"), base)
    v3 = versioned_publish(_frame(spark, "c"), base)
    assert (v2, v3) == ("v-000002", "v-000003")
    assert _snap(read_versioned(spark, base)) == _snap(_frame(spark, "c"))
    kept = sorted(d for d in os.listdir(base) if d.startswith("v-"))
    assert kept == ["v-000002", "v-000003"]  # keep=2: current + pred


def test_reader_never_sees_absence_at_any_crash_point(spark, tmp_path):
    """Decompose a publish into its two steps and read after each: the
    version-directory write (crash here → pointer untouched, OLD data
    served) and the pointer flip (crash here → publish complete, NEW
    data served). At no instant is the reader without a complete
    dataset — the property the in-place swap's documented mid-swap
    window lacks."""
    base = str(tmp_path / "idx")
    versioned_publish(_frame(spark, "old"), base)
    # step 1: next version directory fully written, pointer NOT flipped
    _frame(spark, "new").write.parquet(f"{base}/v-000002")
    assert _snap(read_versioned(spark, base)) == _snap(_frame(spark, "old"))
    # step 2: the atomic pointer replace
    _atomic_small_file(spark, base, VERSION_POINTER, b"v-000002")
    assert _snap(read_versioned(spark, base)) == _snap(_frame(spark, "new"))


def test_orphan_from_crashed_publish_is_skipped_and_pruned(
    spark, tmp_path
):
    """A crash between the directory write and the pointer flip leaves
    an orphan v-dir with a HIGHER number than the pointer. Readers
    ignore it; the next publish numbers past it, protects the
    PREVIOUSLY-POINTED predecessor by name (not by sort order — the
    orphan would out-sort it), and prunes the orphan."""
    import os

    base = str(tmp_path / "idx")
    versioned_publish(_frame(spark, "a"), base)      # v1, pointed
    _frame(spark, "crash").write.parquet(f"{base}/v-000002")  # orphan
    assert _snap(read_versioned(spark, base)) == _snap(_frame(spark, "a"))
    v3 = versioned_publish(_frame(spark, "b"), base)
    assert v3 == "v-000003"
    assert _snap(read_versioned(spark, base)) == _snap(_frame(spark, "b"))
    kept = sorted(d for d in os.listdir(base) if d.startswith("v-"))
    # predecessor v1 retained for in-flight readers; orphan v2 pruned
    assert kept == ["v-000001", "v-000003"]


def test_pointer_layout_survives_emulated_renameless_store(
    spark, tmp_path
):
    """Emulate what an object store actually does. (a) A DIRECTORY
    'rename' is copy+delete: crash mid-copy leaves the destination
    partial and the live path already gone — a reader of the in-place
    layout fails. (b) The pointer layout's commit is ONE small-object
    replace; emulating it as overwrite-PUT shows the reader transitions
    old→new with no intermediate state, and even under the WORST
    emulation (delete then create, which real stores do not need for a
    PUT) the damage is a loud missing-pointer error on a still-complete
    store — never a silently partial dataset."""
    import os
    import shutil

    # (a) in-place directory swap under copy+delete semantics
    live = str(tmp_path / "live")
    _frame(spark, "old").write.parquet(live)
    tmp_new = str(tmp_path / "live__tmp")
    _frame(spark, "new").write.parquet(tmp_new)
    # emulated rename step 1: move live aside = full copy, then delete
    shutil.rmtree(live)  # ...crash before the new copy lands
    with pytest.raises(Exception):
        spark.read.parquet(live).collect()

    # (b) versioned layout: the same crash point leaves readers whole
    base = str(tmp_path / "idx")
    versioned_publish(_frame(spark, "old"), base)
    _frame(spark, "new").write.parquet(f"{base}/v-000002")
    # emulated PUT of the pointer object (what S3 does for a replace):
    # content transitions atomically, file never absent. The local
    # Hadoop FS checksums files, so a raw out-of-band write must drop
    # the .crc sidecar — a real object store has no such sidecar.
    with open(f"{base}/{VERSION_POINTER}", "r+") as fh:
        fh.seek(0)
        fh.write("v-000002")
        fh.truncate()
    crc = f"{base}/.{VERSION_POINTER}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    assert _snap(read_versioned(spark, base)) == _snap(_frame(spark, "new"))
    # worst case: a store that really had no overwrite would go
    # missing→present; missing reads LOUDLY, and the data itself is
    # untouched either way
    os.remove(f"{base}/{VERSION_POINTER}")
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(FileNotFoundError, match="nothing has"):
        read_versioned(spark, base)
    _atomic_small_file(spark, base, VERSION_POINTER, b"v-000002")
    assert _snap(read_versioned(spark, base)) == _snap(_frame(spark, "new"))


def test_upsert_vector_index_versioned_latest_wins(spark, tmp_path):
    """The raw-vector index on the versioned layout: first publish
    normalizes and lands v1; an upsert with colliding ids replaces
    their vectors (latest wins), keeps the rest, and goes live as v2 —
    with v1 retained as the reader grace version."""
    base = str(tmp_path / "vec")

    def vframe(rows):
        return spark.createDataFrame(
            rows, "doc_id long, embedding array<double>"
        )

    v0 = vframe([(i, [float(i + 1), 0.0]) for i in range(4)])
    upsert_vector_index_versioned(spark, base, v0)
    delta = vframe([(2, [0.0, 5.0]), (9, [3.0, 4.0])])
    name = upsert_vector_index_versioned(spark, base, delta)
    assert name == "v-000002"
    got = {
        r.doc_id: tuple(round(x, 6) for x in r.embedding)
        for r in read_versioned(spark, base).collect()
    }  # round 6: l2_normalize carries the +1e-9 norm guard
    assert set(got) == {0, 1, 2, 3, 9}
    assert got[2] == (0.0, 1.0)          # replaced, normalized
    assert got[9] == (0.6, 0.8)          # inserted, normalized
    assert got[0] == (1.0, 0.0)          # untouched survivor
    assert current_version(spark, base) == "v-000002"


def test_keep3_retains_complete_predecessors_not_orphans(
    spark, tmp_path
):
    """keep>2 regression (r15 review): the extra retention slots must go
    to genuinely complete predecessors, not to a crashed publish's
    orphan that happens to out-sort them by name."""
    import os

    base = str(tmp_path / "idx")
    versioned_publish(_frame(spark, "a"), base, keep=3)   # v1
    versioned_publish(_frame(spark, "b"), base, keep=3)   # v2, pointed
    _frame(spark, "crash").write.parquet(f"{base}/v-000003")  # orphan
    versioned_publish(_frame(spark, "c"), base, keep=3)   # v4
    kept = sorted(d for d in os.listdir(base) if d.startswith("v-"))
    # new + predecessor + the one complete grace version; orphan gone
    assert kept == ["v-000001", "v-000002", "v-000004"]
    assert _snap(read_versioned(spark, base)) == _snap(_frame(spark, "c"))
