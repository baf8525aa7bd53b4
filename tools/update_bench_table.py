#!/usr/bin/env python
"""Regenerate the canonical perf table in BENCH_NOTES.md from
bench_results.jsonl (the machine-readable history every bench run appends
to). tests/test_bench_table.py fails when the table drifts from the newest
recorded numbers — run this after any bench run and commit both files."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from targetvae_tpu.utils.bench_log import latest_per_config, replace_block

NOTES = os.path.join(REPO, "BENCH_NOTES.md")


def main():
    latest = latest_per_config()
    if not latest:
        raise SystemExit("bench_results.jsonl is empty — run a bench first")
    with open(NOTES) as f:
        text = f.read()
    new = replace_block(text, latest)
    if new == text:
        print("BENCH_NOTES.md canonical table already up to date")
        return
    with open(NOTES, "w") as f:
        f.write(new)
    print("BENCH_NOTES.md canonical table regenerated")


if __name__ == "__main__":
    main()
