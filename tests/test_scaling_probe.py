"""tools/scaling_probe.py artifact hygiene: a subset probe must MERGE
into the standing BENCH_SCALING document, never clobber it (round 6
lost its 151-query scaling evidence to a single-query re-run)."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "scaling_probe",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools", "scaling_probe.py"),
)
scaling_probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scaling_probe)


ROW = {"t_small": 1.0, "t_big": 10.0, "alpha": 1.0, "canary": 0.4}


def test_merge_extends_existing_document(tmp_path):
    p = str(tmp_path / "BENCH_SCALING.json")
    scaling_probe.write_results(p, {"q1": ROW, "q2": ROW}, 10.0, "sfA", "sfB")
    doc = scaling_probe.write_results(p, {"q3": ROW}, 10.0, "sfA", "sfB")
    assert set(doc["queries"]) == {"q1", "q2", "q3"}
    on_disk = json.load(open(p))
    assert set(on_disk["queries"]) == {"q1", "q2", "q3"}


def test_rerun_updates_in_place_without_dropping_others(tmp_path):
    p = str(tmp_path / "BENCH_SCALING.json")
    scaling_probe.write_results(p, {"q1": ROW, "q2": ROW}, 10.0, "sfA", "sfB")
    newer = dict(ROW, alpha=0.5)
    doc = scaling_probe.write_results(p, {"q1": newer}, 10.0, "sfA", "sfB")
    assert doc["queries"]["q1"]["alpha"] == 0.5
    assert "q2" in doc["queries"]


def test_incompatible_runs_refuse_to_blend(tmp_path):
    p = str(tmp_path / "BENCH_SCALING.json")
    scaling_probe.write_results(p, {"q1": ROW}, 10.0, "sfA", "sfB")
    with pytest.raises(SystemExit):
        scaling_probe.write_results(p, {"q2": ROW}, 100.0, "sfA", "sfC")
    # the standing document is untouched by the refused write
    assert set(json.load(open(p))["queries"]) == {"q1"}


def test_corrupt_existing_file_is_replaced_not_fatal(tmp_path):
    p = str(tmp_path / "BENCH_SCALING.json")
    with open(p, "w") as f:
        f.write("{not json")
    doc = scaling_probe.write_results(p, {"q1": ROW}, 10.0, "sfA", "sfB")
    assert set(doc["queries"]) == {"q1"}
