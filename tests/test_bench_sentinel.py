"""Cross-artifact regression channel of the bench noise sentinel (r14).

Steady co-tenant load defeats the foreign-CPU meter (constant load can
sit under the per-family limit) and the rep-spread meter (load constant
across all reps produces no spread) by construction — the r13 artifact
published cdc_chunks 2.251 s / rel_pricing_summary 0.577 s clean while a
quiet-host rerun measured 1.448/0.305 s. The third channel compares each
family's warm best against the median of the last 3 committed
BENCH_r*.json artifacts at the same sf. These tests pin the baseline
extraction (artifact shapes, sf filter, recency window) and the median's
robustness to one noisy committed round — no SparkSession needed.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import (  # noqa: E402
    REGRESSION_LIMIT,
    REGRESSION_MIN_DELTA_SEC,
    artifact_history,
    regression_median,
)


def _write(tmp_path, name, payload):
    (tmp_path / name).write_text(json.dumps(payload))


def test_history_reads_both_artifact_shapes_and_filters_sf(tmp_path):
    # driver-wrapped shape (headline under "parsed")
    _write(tmp_path, "BENCH_r11.json", {
        "rc": 0, "sf": 0.1,
        "parsed": {"sf": 0.1, "queries": {"fam": 13.371, "other": 1.0}},
    })
    # raw headline shape
    _write(tmp_path, "BENCH_r12.json", {"sf": 0.1, "queries": {"fam": 1.706}})
    # mismatched sf: excluded entirely
    _write(tmp_path, "BENCH_r13.json", {"sf": 0.01, "queries": {"fam": 0.2}})
    h = artifact_history(0.1, here=str(tmp_path))
    assert h["fam"] == [13.371, 1.706]
    assert h["other"] == [1.0]


def test_history_keeps_only_last_three_rounds_and_skips_junk(tmp_path):
    for r, v in ((9, 9.0), (10, 1.0), (11, 2.0), (12, 3.0)):
        _write(tmp_path, f"BENCH_r{r:02d}.json",
               {"sf": 0.1, "queries": {"fam": v, "err": -1.0}})
    (tmp_path / "BENCH_r13.json").write_text("{not json")
    h = artifact_history(0.1, here=str(tmp_path))
    # the window is the last 3 by ROUND NUMBER (r11-r13): r9/r10 rotate
    # out, and the unreadable r13 is skipped without killing the channel
    # (fewer samples — conservative) or widening the window; errored
    # families (<= 0) excluded
    assert h["fam"] == [2.0, 3.0]
    assert "err" not in h


def test_median_is_robust_to_one_noisy_committed_round():
    # the r11 cdc_chunks case: one 6x-inflated committed artifact must
    # not drag the baseline up (mean would: 5.8; median holds 2.251)
    h = {"cdc_chunks": [13.371, 1.706, 2.251]}
    assert regression_median(h, "cdc_chunks") == 2.251


def test_new_and_thin_families_never_trip():
    assert regression_median({}, "brand_new") is None
    assert regression_median({"fam": [1.0]}, "fam") is None  # < min history
    assert regression_median({"fam": [1.0, 2.0]}, "fam") == 2.0


def test_flag_thresholds_match_the_steady_load_case():
    # the r13 steady-state case the channel exists for: published 2.251
    # vs quiet 1.448 — with a clean median near 1.45, the inflated run
    # flags; the quiet one does not; and a sub-second family needs the
    # absolute delta too
    med = 1.448
    def over(warm):
        return (warm > REGRESSION_LIMIT * med
                and warm - med > REGRESSION_MIN_DELTA_SEC)
    assert over(2.251)
    assert not over(1.448)
    small_med = 0.1
    assert not (0.25 > REGRESSION_LIMIT * small_med
                and 0.25 - small_med > REGRESSION_MIN_DELTA_SEC)
