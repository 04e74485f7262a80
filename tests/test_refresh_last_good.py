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
    # per-key provenance: measured keys get the new source, retained keys
    # keep a legacy pointer naming the old sources — never the new run's
    prov = rec["fallback_provenance"]
    assert prov["value"] == "new run"
    assert prov["fps_720p_b4"] == "new run"
    assert "new run" not in prov["ssmr_stream_fps"]
    assert "old run B" in prov["ssmr_stream_fps"]
    # the derived human view names exactly the keys each source measured
    new_line = next(s for s in rec["fallback_sources"] if s.startswith("new run"))
    assert "value" in new_line and "ssmr_stream_fps" not in new_line


def test_provenance_survives_repeated_refreshes(tmp_path, monkeypatch):
    """The ADVICE round-3 failure: re-refreshing must not re-attribute a
    retained metric to the newest run, nor nest source strings."""
    record = tmp_path / "last_good.json"
    log_a = tmp_path / "a.log"
    log_a.write_text(json.dumps({
        "metric": "720p_interp_frames_per_sec_8x", "value": 40.0,
        "unit": "frames/sec/chip", "train_samples_per_sec_b8_224": 67.0,
    }) + "\n")
    log_b = tmp_path / "b.log"
    log_b.write_text(json.dumps({
        "metric": "720p_interp_frames_per_sec_8x", "value": 50.0,
        "unit": "frames/sec/chip",
    }) + "\n")
    rg = _load(record)
    for log, src in ((log_a, "run A"), (log_b, "run B"), (log_b, "run B2")):
        monkeypatch.setattr(sys, "argv", ["rg", str(log), "--source", src])
        rg.main()
    rec = json.loads(record.read_text())
    prov = rec["fallback_provenance"]
    assert prov["value"] == "run B2"
    assert prov["train_samples_per_sec_b8_224"] == "run A"  # still run A
    # no nesting: each source string stays a flat label
    assert all("RETAINED" not in s for s in rec["fallback_sources"])
    assert len(rec["fallback_sources"]) == 2


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
