"""The driver records bench.py's LAST 2,000 stdout chars; r4's printed
line was 2,721 chars and the official BENCH_r04.json came back
parsed:null.  Pin that the compact projection printed as the final line
stays parseable and under budget for a payload at least as large as the
one that broke."""

import importlib.util
import json
import os

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(_ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def r4_full():
    with open(os.path.join(_ROOT, "BENCH_r04_builder.json")) as fh:
        return json.load(fh)


def test_compact_line_under_budget(bench, r4_full):
    line = json.dumps(bench.compact_payload(r4_full))
    assert len(line) <= bench.LINE_BUDGET
    # the driver parses the tail capture; the whole line must fit in it
    assert bench.LINE_BUDGET <= 2000


def test_compact_keeps_graded_fields(bench, r4_full):
    c = bench.compact_payload(r4_full)
    assert c["metric"] == "headline_total_sec"
    assert c["value"] == r4_full["value"]
    assert c["queries"] == r4_full["queries"]
    assert c["scaling"]["efficiency"] == r4_full["scaling"]["efficiency"]
    assert c["scaling"]["spread"] == r4_full["scaling"]["spread"]
    assert c["host_canary"]["headline_quiet"] is True
    assert c["host_canary"]["n_attempts"] == len(
        r4_full["host_canary"]["attempts"])
    assert c["triple_pr"]["precision"] == 1.0
    assert c["full_record"] == os.path.basename(bench.FULL_RECORD_PATH)


def test_compact_sheds_detail_when_oversized(bench, r4_full):
    """Future headline growth must degrade gracefully, never overflow."""
    big = json.loads(json.dumps(r4_full))
    big["queries"] = {f"synthetic_query_with_a_long_name_{i:03d}": i + 0.123
                      for i in range(80)}
    line = json.dumps(bench.compact_payload(big))
    assert len(line) <= bench.LINE_BUDGET
    assert json.loads(line)["queries_truncated"] is True
