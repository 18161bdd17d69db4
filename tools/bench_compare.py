#!/usr/bin/env python3
"""Compare two bench runs query-by-query.

Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]

Accepts either the one-line Bench stdout JSON ({"queries": {...}}), the
bench_queries_full.json sidecar, or a driver BENCH_r*.json artifact
(whose "tail" field holds a possibly-truncated capture — parsed
best-effort). Prints per-query ratios for queries present in both runs,
flagging |ratio| beyond the threshold, and a total.

Box noise caveat: single-shot numbers on a shared host spike 1.5-3x;
re-measure flagged queries with SPARK_GRAFT_REPEAT=3 before calling
anything a regression (see README benchmark-history notes).
"""
import json
import re
import sys


def load(path: str) -> dict:
    raw = open(path).read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict):
        if isinstance(doc.get("queries"), dict):
            return doc["queries"]
        raw = doc.get("tail", raw)
    # best-effort: pull "name":seconds pairs out of a (truncated) capture
    pairs = re.findall(r'"([a-z0-9_]+)"\s*:\s*([0-9]+\.[0-9]+)', raw)
    skip = {"value", "omitted_sec", "fast_omitted_sec", "total"}
    return {k: float(v) for k, v in pairs if k not in skip}


def main() -> int:
    args, thr = [], 1.5
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                i += 1
                thr = float(argv[i])
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    common = sorted(set(old) & set(new), key=lambda k: -(new[k] / max(old[k], 1e-9)))
    if not common:
        print("no common queries parsed")
        return 1
    flagged = 0
    for k in common:
        r = new[k] / max(old[k], 1e-9)
        mark = ""
        if r >= thr:
            mark = "  <-- slower"
            flagged += 1
        elif r <= 1.0 / thr:
            mark = "  (faster)"
        print(f"{k:34s} {old[k]:8.3f} -> {new[k]:8.3f}  x{r:5.2f}{mark}")
    to, tn = sum(old[k] for k in common), sum(new[k] for k in common)
    print(f"\n{len(common)} common queries: {to:.1f}s -> {tn:.1f}s (x{tn / to:.2f}); "
          f"{flagged} beyond x{thr} (re-measure with SPARK_GRAFT_REPEAT=3 before judging)")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"only in old: {', '.join(only_old)}")
    if only_new:
        print(f"only in new: {', '.join(only_new)}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # output piped into head
        sys.exit(0)
