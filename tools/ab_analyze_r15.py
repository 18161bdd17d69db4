#!/usr/bin/env python3
"""Analyze an interleaved two-binary A/B (ABBA full-surface invocations,
each internally interleaved min-of-3) and emit an ab_pair_drift JSON.

Usage: ab_analyze_r15.py <abdir> <out.json> [tagA tagB]
where <abdir>/<tag>/bench_history.jsonl each hold the per-invocation full
per-query maps. tagA is the baseline binary, tagB the candidate (ratio =
tagB/tagA); defaults r13 r14 (the r15 drift adjudication this script was
built for). A query present in only one binary's history is reported
under missing_in_<tag> instead of crashing the analysis (r15 advice)."""
import json
import subprocess
import sys
import time
from pathlib import Path

abdir = Path(sys.argv[1])
out = Path(sys.argv[2])
tag_a, tag_b = (sys.argv[3], sys.argv[4]) if len(sys.argv) >= 5 else ("r13", "r14")
tags = (tag_a, tag_b)

runs = {}
for tag in tags:
    lines = [json.loads(l) for l in
             (abdir / tag / "bench_history.jsonl").read_text().splitlines()]
    runs[tag] = lines

WATCH = ["kcore_parts", "bfs_distance_histogram", "neighbor_degree_function",
         "market_basket_lift", "hits_power_iteration", "pagerank_bipartite",
         "label_propagation", "copurchase_recall_at_k", "dedup_components",
         "clustering_coeff_top"]

names = set()
for tag, lines in runs.items():
    for l in lines:
        names.update(l["queries"])
rows = {}
missing = {tag: [] for tag in tags}
for name in sorted(names):
    e = {}
    absent = [tag for tag, lines in runs.items()
              if not any(name in l["queries"] for l in lines)]
    if absent:
        # asymmetric coverage: record, don't crash on min() of empty vals
        for tag in absent:
            missing[tag].append(name)
        continue
    for tag, lines in runs.items():
        vals = [l["queries"][name] for l in lines if name in l["queries"]]
        e[f"{tag}_min"] = min(vals)
        e[f"{tag}_all"] = vals
    e["ratio"] = (round(e[f"{tag_b}_min"] / e[f"{tag_a}_min"], 3)
                  if e[f"{tag_a}_min"] > 0 else None)
    rows[name] = e

tot = {tag: round(sum(rows[n][f"{tag}_min"] for n in rows), 3)
       for tag in tags}
watch = {n: rows[n] for n in WATCH if n in rows}
regress = {n: r for n, r in rows.items()
           if r["ratio"] and r["ratio"] > 1.10 and r[f"{tag_b}_min"] > 0.5}
improve = {n: r for n, r in rows.items()
           if r["ratio"] and r["ratio"] < 0.90 and r[f"{tag_a}_min"] > 0.5}

sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                     text=True, cwd="/root/repo").stdout.strip()
doc = {
    "git_sha": sha,
    "epoch_ms": int(time.time() * 1000),
    "protocol": ("interleaved two-binary A/B, one quiet box window: ABBA "
                 f"full-surface invocations — {tag_b}, {tag_a}, {tag_a}, "
                 f"{tag_b} — each SPARK_GRAFT_REPEAT=3 (internal "
                 "interleaved min-of-3), sf0.1, local[32]; per-binary "
                 "per-query minimum over the 2x3=6 passes"),
    "tags": {"baseline": tag_a, "candidate": tag_b},
    "total_min_of_mins": tot,
    "ratio_total": round(tot[tag_b] / tot[tag_a], 4),
    "watch_list": watch,
    "regressions_gt_1p10": {n: r["ratio"] for n, r in sorted(
        regress.items(), key=lambda kv: -kv[1]["ratio"])},
    "improvements_lt_0p90": {n: r["ratio"] for n, r in sorted(
        improve.items(), key=lambda kv: kv[1]["ratio"])},
    **{f"missing_in_{tag}": sorted(ms) for tag, ms in missing.items() if ms},
    "queries": rows,
}
out.write_text(json.dumps(doc, indent=1))
print(f"{tag_a} total {tot[tag_a]}  {tag_b} total {tot[tag_b]}  "
      f"ratio {doc['ratio_total']}")
print("watch:")
for n in WATCH:
    if n in rows:
        r = rows[n]
        print(f"  {n:28s} {tag_a} {r[f'{tag_a}_min']:6.3f}  "
              f"{tag_b} {r[f'{tag_b}_min']:6.3f}  x{r['ratio']}")
for tag, ms in missing.items():
    if ms:
        print(f"missing_in_{tag}: {ms}")
print(f"regressions>1.10: {len(regress)}  improvements<0.90: {len(improve)}")
