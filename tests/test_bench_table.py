"""Guard against the BENCH_NOTES.md canonical perf table going stale.

Rounds 2 and 3 both shipped a canonical table that disagreed with the newest
measured numbers in the same file (VERDICT r3 weak #4). The table is now
GENERATED from bench_results.jsonl (every bench run appends there —
bench.py / tools/bench_config.py) by tools/update_bench_table.py; this test
fails whenever the committed table drifts from the newest recorded entry per
config beyond run-to-run variance, making silent staleness structurally
impossible.
"""

import json
import os

from targetvae_tpu.utils.bench_log import (
    CANONICAL_CONFIGS, DRIFT_TOLERANCE, REPO_ROOT, RESULTS_PATH,
    extract_table_values, latest_per_config, record, render_block,
    replace_block)

NOTES = os.path.join(REPO_ROOT, "BENCH_NOTES.md")


def _notes_text():
    with open(NOTES) as f:
        return f.read()


def test_history_exists_and_parses():
    assert os.path.exists(RESULTS_PATH), "bench_results.jsonl missing"
    latest = latest_per_config()
    assert "flagship" in latest
    for entry in latest.values():
        for key in ("batch", "ms_per_step", "images_per_sec",
                    "tflops_per_step", "mfu", "ts"):
            assert key in entry, f"{entry['config']} missing {key}"


def test_canonical_table_matches_history():
    """Every config present in both the table and the history must agree:
    same batch, and images/sec within the documented run-to-run variance
    allowance. A real perf change (>5%) therefore forces a regeneration."""
    table = extract_table_values(_notes_text())
    assert table, "BENCH_NOTES.md has no generated canonical table"
    latest = latest_per_config()
    problems = []
    for key, _label in CANONICAL_CONFIGS:
        if key not in latest:
            continue
        if key not in table:
            problems.append(f"{key}: in history but not in the table "
                            "(run tools/update_bench_table.py)")
            continue
        t, h = table[key], latest[key]
        if t["batch"] != h["batch"]:
            problems.append(f"{key}: table batch {t['batch']} != newest "
                            f"recorded batch {h['batch']}")
            continue
        rel = abs(t["images_per_sec"] - h["images_per_sec"]) \
            / h["images_per_sec"]
        if rel > DRIFT_TOLERANCE:
            problems.append(
                f"{key}: table says {t['images_per_sec']:.0f} img/s but the "
                f"newest run measured {h['images_per_sec']:.0f} "
                f"({rel:.1%} apart) — run tools/update_bench_table.py")
    assert not problems, "; ".join(problems)


def test_regeneration_round_trip(tmp_path):
    """record -> regenerate -> parse recovers the recorded values."""
    hist = tmp_path / "hist.jsonl"
    record({"config": "flagship", "batch": 100, "ms_per_step": 18.4,
            "images_per_sec": 5440.0, "tflops_per_step": 1.795,
            "mfu": 0.4957}, path=str(hist))
    record({"config": "flagship", "batch": 100, "ms_per_step": 17.0,
            "images_per_sec": 5882.0, "tflops_per_step": 1.795,
            "mfu": 0.5362}, path=str(hist))
    latest = latest_per_config(str(hist))
    assert latest["flagship"]["ms_per_step"] == 17.0  # newest line wins
    text = ("header\n"
            + render_block({}).replace("never", "never")  # markers only
            + "\nfooter\n")
    spliced = replace_block(text, latest)
    parsed = extract_table_values(spliced)
    assert parsed["flagship"]["batch"] == 100
    assert abs(parsed["flagship"]["images_per_sec"] - 5882.0) < 1
    assert abs(parsed["flagship"]["mfu"] - 0.5362) < 1e-3


def test_history_lines_are_json():
    with open(RESULTS_PATH) as f:
        for i, line in enumerate(f):
            if line.strip():
                entry = json.loads(line)
                assert "config" in entry, f"line {i + 1} lacks 'config'"


def test_record_auto_splices_table(tmp_path, monkeypatch):
    """record() to the default history path regenerates the notes table in
    place (VERDICT r4 #7: benching must leave the committed table exactly
    current, not within-5% of it)."""
    import targetvae_tpu.utils.bench_log as bl

    hist = tmp_path / "hist.jsonl"
    notes = tmp_path / "notes.md"
    notes.write_text("head\n" + bl.render_block({}) + "\nfoot\n")
    monkeypatch.setattr(bl, "RESULTS_PATH", str(hist))
    monkeypatch.setattr(bl, "NOTES_PATH", str(notes))
    bl.record({"config": "flagship", "batch": 100, "ms_per_step": 17.0,
               "images_per_sec": 5882.0, "tflops_per_step": 1.795,
               "mfu": 0.5362})
    parsed = bl.extract_table_values(notes.read_text())
    assert abs(parsed["flagship"]["images_per_sec"] - 5882.0) < 1
    # explicit non-default paths (unit tests, scratch runs) leave notes alone
    before = notes.read_text()
    bl.record({"config": "flagship", "batch": 100, "ms_per_step": 1.0,
               "images_per_sec": 1.0, "tflops_per_step": 1.0, "mfu": 0.1},
              path=str(tmp_path / "other.jsonl"))
    assert notes.read_text() == before
