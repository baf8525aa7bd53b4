#!/usr/bin/env python
"""Regenerate the canonical perf table in BENCH_NOTES.md from
bench_results.jsonl. Since round 5 `bench_log.record()` does this splice
automatically after every bench run; this tool remains for manual
re-syncs (e.g. after hand-editing the history)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from targetvae_tpu.utils.bench_log import latest_per_config, update_notes_table


def main():
    if not latest_per_config():
        raise SystemExit("bench_results.jsonl is empty — run a bench first")
    # strict: the manual tool must report a broken setup (missing markers,
    # corrupt history) loudly, unlike record()'s never-fail auto-splice
    if update_notes_table(strict=True):
        print("BENCH_NOTES.md canonical table regenerated")
    else:
        print("BENCH_NOTES.md canonical table already up to date")


if __name__ == "__main__":
    main()
