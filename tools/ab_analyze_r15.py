#!/usr/bin/env python3
"""Analyze the r15 interleaved two-binary A/B (r13 vs r14 binaries, ABBA
full-surface invocations, each internally interleaved min-of-3) and emit
ab_pair_drift_r15.json. Usage: ab_analyze_r15.py <abdir> <out.json>
where <abdir>/{r13,r14}/bench_history.jsonl each hold the per-invocation
full per-query maps."""
import json
import subprocess
import sys
import time
from pathlib import Path

abdir = Path(sys.argv[1])
out = Path(sys.argv[2])

runs = {}
for tag in ("r13", "r14"):
    lines = [json.loads(l) for l in
             (abdir / tag / "bench_history.jsonl").read_text().splitlines()]
    runs[tag] = lines

WATCH = ["kcore_parts", "bfs_distance_histogram", "neighbor_degree_function",
         "market_basket_lift", "hits_power_iteration", "pagerank_bipartite",
         "label_propagation", "copurchase_recall_at_k", "dedup_components",
         "clustering_coeff_top"]

per = {}
names = set()
for tag, lines in runs.items():
    for l in lines:
        names.update(l["queries"])
rows = {}
for name in sorted(names):
    e = {}
    for tag, lines in runs.items():
        vals = [l["queries"][name] for l in lines if name in l["queries"]]
        e[f"{tag}_min"] = min(vals)
        e[f"{tag}_all"] = vals
    e["ratio"] = round(e["r14_min"] / e["r13_min"], 3) if e["r13_min"] > 0 else None
    rows[name] = e

tot = {tag: round(sum(rows[n][f"{tag}_min"] for n in rows), 3)
       for tag in ("r13", "r14")}
watch = {n: rows[n] for n in WATCH if n in rows}
regress = {n: r for n, r in rows.items()
           if r["ratio"] and r["ratio"] > 1.10 and r["r14_min"] > 0.5}
improve = {n: r for n, r in rows.items()
           if r["ratio"] and r["ratio"] < 0.90 and r["r13_min"] > 0.5}

sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                     text=True, cwd="/root/repo").stdout.strip()
doc = {
    "git_sha": sha,
    "epoch_ms": int(time.time() * 1000),
    "protocol": ("interleaved two-binary A/B, one quiet box window (round-15 "
                 "start, load<0.2): ABBA full-surface invocations — r14, r13, "
                 "r13, r14 — each SPARK_GRAFT_REPEAT=3 (internal interleaved "
                 "min-of-3), sf0.1, local[32]; per-binary per-query minimum "
                 "over the 2x3=6 passes"),
    "binaries": {
        "r13": "6add456 classes snapshot (worktree build; the binary behind BENCH_r13 148.1 s)",
        "r14": "19c9d8f classes snapshot (HEAD: SER checkpoint level + lazy iterative plans)",
    },
    "total_min_of_mins": tot,
    "ratio_total": round(tot["r14"] / tot["r13"], 4),
    "watch_list": watch,
    "regressions_gt_1p10": {n: r["ratio"] for n, r in sorted(
        regress.items(), key=lambda kv: -kv[1]["ratio"])},
    "improvements_lt_0p90": {n: r["ratio"] for n, r in sorted(
        improve.items(), key=lambda kv: kv[1]["ratio"])},
    "queries": rows,
}
out.write_text(json.dumps(doc, indent=1))
print(f"r13 total {tot['r13']}  r14 total {tot['r14']}  "
      f"ratio {doc['ratio_total']}")
print("watch:")
for n in WATCH:
    if n in rows:
        r = rows[n]
        print(f"  {n:28s} r13 {r['r13_min']:6.3f}  r14 {r['r14_min']:6.3f}  "
              f"x{r['ratio']}")
print(f"regressions>1.10: {len(regress)}  improvements<0.90: {len(improve)}")
