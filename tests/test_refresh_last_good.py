"""benchmarks/refresh_last_good.py contract: merge a fresh bench log's last
live JSON line into the stale-fallback record, retaining unmeasured metrics
with their provenance — the evidence chain bench.py falls back to when the
TPU tunnel is dead depends on this merge being right."""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(tmp_record):
    spec = importlib.util.spec_from_file_location(
        "rg_under_test", os.path.join(REPO, "benchmarks", "refresh_last_good.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.RECORD = str(tmp_record)
    return mod


def test_merge_retains_unmeasured_metrics(tmp_path, monkeypatch):
    record = tmp_path / "last_good.json"
    record.write_text(json.dumps({
        "metric": "720p_interp_frames_per_sec_8x", "value": 40.0,
        "unit": "frames/sec/chip", "ssmr_stream_fps": 19.2,
        "stale_fallback": True,
        "fallback_sources": ["old run A (720p)", "old run B (ssmr)"],
    }))
    log = tmp_path / "bench.log"
    log.write_text(
        json.dumps({"metric": "720p_interp_frames_per_sec_8x", "value": 41.0,
                    "unit": "frames/sec/chip"}) + "\n"
        + json.dumps({"metric": "720p_interp_frames_per_sec_8x",
                      "value": 50.0, "unit": "frames/sec/chip",
                      "fps_720p_b4": 50.0, "batch": 4}) + "\n"
    )
    rg = _load(record)
    monkeypatch.setattr(sys, "argv", ["rg", str(log), "--source", "new run"])
    rg.main()
    rec = json.loads(record.read_text())
    assert rec["value"] == 50.0  # the LAST live line wins
    assert rec["fps_720p_b4"] == 50.0
    assert rec["ssmr_stream_fps"] == 19.2  # retained
    assert rec["stale_fallback"] is True
    assert any("new run" in s for s in rec["fallback_sources"])
    assert any("RETAINED" in s and "ssmr_stream_fps" in s
               for s in rec["fallback_sources"])


def test_rejects_fallback_only_logs(tmp_path, monkeypatch):
    """A log whose only JSON lines are themselves stale fallbacks must NOT
    refresh the record (that would launder staleness into 'fresh')."""
    record = tmp_path / "last_good.json"
    record.write_text(json.dumps({"value": 40.0, "stale_fallback": True}))
    log = tmp_path / "bench.log"
    log.write_text(json.dumps({
        "metric": "720p_interp_frames_per_sec_8x", "value": 40.0,
        "stale_fallback": True,
    }) + "\n")
    rg = _load(record)
    monkeypatch.setattr(sys, "argv", ["rg", str(log), "--source", "x"])
    with pytest.raises(SystemExit):
        rg.main()
