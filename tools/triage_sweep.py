#!/usr/bin/env python3
"""Triage a ProfileStages sweep artifact: bucket flagged stages into the
classes the repo has adjudicated before, so a scale sweep's flag list
(hundreds of rows at x100) reduces to the handful worth reading.

Buckets, in adjudication order:
  LEAF        zero shuffle read (scan-rooted): the few-file/one-row-group
              testdata artifact — inherent to the fixture, not the plan.
  TINY        post-shuffle but < minBytes shuffled input AND < minMs wall:
              small-relation rounds (iterative frontiers, 84-row merges,
              broadcast builds) + concurrent-branch queue artifacts.
  QUEUE?      post-shuffle, < minBytes input but >= minMs wall: the time
              CANNOT be explained by the input mass — either a genuine
              tiny-input fan-out serialization (the r13 block_bloom
              class) or stage wall-clock inflated by a concurrent branch
              (submission->completion includes CPU starvation). Needs a
              human read of the final adaptive plan.
  HOT         post-shuffle, >= minBytes shuffled input on <= maxTasks
              tasks for >= minMs: real underparallelization candidates —
              AQE coalesced a join/aggregate that carries real data.

Usage: triage_sweep.py <sweep.json> [minMs=2000] [minBytes=1048576]
"""
import json
import sys


def main():
    path = sys.argv[1]
    min_ms = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    min_bytes = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 20
    doc = json.load(open(path))
    qs = doc.get("queries", doc)
    buckets = {"LEAF": [], "TINY": [], "QUEUE?": [], "HOT": []}
    for name in sorted(qs):
        v = qs[name]
        if not isinstance(v, dict):
            continue
        for s in v.get("flagged", []):
            ms, rb = s.get("ms", 0), s.get("shuf_read_bytes", 0)
            if s.get("leaf"):
                b = "LEAF"
            elif rb < min_bytes:
                b = "TINY" if ms < min_ms else "QUEUE?"
            else:
                b = "HOT" if ms >= min_ms else "TINY"
            buckets[b].append(
                f"{name:34} stage {s.get('id','?'):>5} {ms:>7} ms "
                f"on {s.get('tasks','?'):>2} tasks shufR={rb:>12} B")
    for b in ("HOT", "QUEUE?", "TINY", "LEAF"):
        rows = buckets[b]
        print(f"== {b}: {len(rows)} ==")
        if b in ("HOT", "QUEUE?"):
            for r in rows:
                print("  " + r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
