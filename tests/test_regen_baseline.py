"""tools/regen_baseline.py: the generated headline table is load-bearing
evidence (BASELINE.md provenance, VERDICT r4 item 7) — pin its rendering
against the committed dress record and a synthetic driver capture."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
import regen_baseline as rb  # noqa: E402

DRESS = Path(__file__).resolve().parents[1] / "BENCH_r5_dress.jsonl"


@pytest.fixture()
def records():
    compact, full = rb.parse_records(str(DRESS))
    return compact, full


def test_parse_records_finds_compact_and_full(records):
    compact, full = records
    # compact = the size-capped headline line; full = has serving_stages
    assert "serving_stages" not in compact["extra"]
    assert full is not None and "serving_stages" in full["extra"]
    assert len(json.dumps(compact)) <= 1500


def test_render_contains_every_promoted_capacity_row(records):
    compact, full = records
    out = rb.render(compact, full, "test-provenance")
    # the 50M capacity row renders with its q=1 value and context
    assert "`pq_50m_q1_ms`" in out
    line = next(l for l in out.splitlines() if "pq_50m_q1_ms" in l)
    assert "ms" in line and "clusters" in line and "GB device state" in line
    # serving row carries the bench-host topology (VERDICT r4 weak #4)
    srv = next(l for l in out.splitlines() if "`srv_p50_ms`" in l)
    assert "-core bench host" in srv and "tunnel RTT" in srv


def test_prov_column_marks_driver_verified_keys(records):
    compact, full = records
    driver_extra = {"clip": 18247.0, "value": 88636.0}  # r4-style capture
    out = rb.render(compact, full, "p", driver_extra, "BENCH_rTEST.json")
    rows = {}
    for line in out.splitlines():
        if line.startswith("| ") and "`" in line:
            cells = [c.strip() for c in line.split("|")]
            key = cells[2].strip("`")
            rows[key] = cells[5]
    assert rows["clip"] == "**drv**"
    assert rows["value"] == "**drv**"
    # a key the driver never reached is builder-only
    assert rows["pq_50m_q1_ms"] == "bld"
    assert "BENCH_rTEST.json" in out


def test_unparseable_driver_capture_is_marked(tmp_path):
    bad = tmp_path / "BENCH_r99.json"
    bad.write_text("{not json")
    extra, name = rb.load_driver_extra(str(bad))
    assert extra == {}
    assert "unparseable" in name
