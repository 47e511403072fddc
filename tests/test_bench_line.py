"""The bench stdout line must fit the driver's 2000-char capture buffer.

BENCH_r02-r04 recorded ``"parsed": null`` because the full per-query
JSON line outgrew the driver's tail buffer; ``bench._fit_line`` trims
the queries dict (gate-priority first) so the line stays parseable.
No SparkSession needed — pure-python.
"""

import json

import bench
from __spark_entry__ import GATE_PRIORITY


def _payload(timings):
    return {
        "metric": "tpch_suite_total",
        "value": 55.5,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "startup_sec": 12.0,
        "empty_results": [],
        "n_queries": len(timings),
        "r01_subset_total": 44.0,
    }


def test_fit_line_stays_under_driver_buffer():
    # worst case: long names, many queries
    timings = {f"some_longish_query_name_{i:03d}": 0.123 + i * 0.01 for i in range(200)}
    line = json.dumps(bench._fit_line(_payload(timings)), separators=(",", ":"))
    assert len(line) <= 2000
    doc = json.loads(line)
    assert doc["value"] == 55.5
    assert doc["queries_elided"] == 200 - len(doc["queries"])


def test_fit_line_keeps_every_gate_query():
    # the real registry: gate names + a plausible tail
    timings = {k: 0.5 for k in GATE_PRIORITY}
    timings.update({f"tail_query_number_{i:02d}": 1.0 for i in range(80)})
    doc = bench._fit_line(_payload(timings))
    assert all(k in doc["queries"] for k in GATE_PRIORITY)
    line = json.dumps(doc, separators=(",", ":"))
    assert len(line) <= 2000


def test_fit_line_noop_when_small():
    timings = {"q1": 0.4, "q2": 0.3}
    doc = bench._fit_line(_payload(timings))
    assert doc["queries"] == timings
    assert doc["queries_elided"] == 0


def test_real_registry_line_parses_from_a_2000_char_tail():
    # simulate the driver: keep only the LAST 2000 chars of stdout and
    # parse the last line found there — the real failure mode of r02-r04
    from xngin_spark import queries as q

    q.load_all()
    timings = {k: 1.234 for k in q.QUERIES}
    line = json.dumps(bench._fit_line(_payload(timings)), separators=(",", ":"))
    stdout = "# noise line\n" * 50 + line + "\n"
    tail = stdout[-2000:]
    parsed = json.loads(tail.strip().splitlines()[-1])
    assert parsed["metric"] == "tpch_suite_total"
    assert all(k in parsed["queries"] for k in GATE_PRIORITY if k in timings)
