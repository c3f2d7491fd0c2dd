"""tools/index_doctor.py over injected protocol states: the doctor must
name the crash the protocol's own guards would name, read-only (it
never heals, takes no lease, leaves every injected state exactly as it
found it)."""
from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"alpha bravo doc{i}") for i in range(6)],
        "doc_id long, text string",
    )


def test_index_doctor_states(spark, tmp_path):
    from index_doctor import diagnose, render

    from clinical_vector_search_spark.io.tables import (
        _lease_path,
        _marker_dir,
        compact_batched,
    )
    from clinical_vector_search_spark.operators.sparse import (
        trigram_index_add,
    )

    base = str(tmp_path / "postings")

    # absent path
    st = diagnose(spark, base)
    assert not st["path_exists"] and "nothing maintained" in (
        st["suggested_action"]
    )

    # healthy maintained index
    trigram_index_add(spark, _docs(spark), 0, str(tmp_path))
    st = diagnose(spark, base)
    assert st["path_exists"] and st["suggested_action"].startswith("healthy")
    assert st["batch_subdirs"] == ["batch-0"]

    # held lease (injected)
    with open(_lease_path(base), "w") as fh:
        fh.write('{"pid": 1, "host": "gone"}')
    st = diagnose(spark, base)
    assert st["lease"] is not None
    assert "break_stale_lease_after_sec" in st["suggested_action"]
    # lease + live marker: both-in-flight diagnosis
    os.makedirs(_marker_dir(base), exist_ok=True)
    with open(f"{_marker_dir(base)}/m-test", "w") as fh:
        fh.write("x")
    st = diagnose(spark, base)
    assert "both" in st["suggested_action"]
    os.remove(f"{_marker_dir(base)}/m-test")
    os.rmdir(_marker_dir(base))
    os.remove(_lease_path(base))

    # crashed mid-swap: live dir absent, __old sibling present
    os.rename(base, base + "__old_dead1")
    st = diagnose(spark, base)
    assert "mid-swap" in st["suggested_action"]
    out = render(st)
    assert "__old_dead1" in out and "self-heal" in out
    os.rename(base + "__old_dead1", base)

    # fence without its subdirectory folded: compaction fences, then we
    # re-inject the batch directory to model "fenced but still present"
    trigram_index_add(spark, _docs(spark), 1, str(tmp_path))
    assert compact_batched(spark, base) >= 1
    os.makedirs(f"{base}/batch-1", exist_ok=True)
    st = diagnose(spark, base)
    assert "RE-RUN the compaction" in st["suggested_action"]

    # doctor is read-only: nothing it printed changed the state
    st2 = diagnose(spark, base)
    assert st2["suggested_action"] == st["suggested_action"]
