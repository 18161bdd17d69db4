#!/usr/bin/env python3
"""10x-scale robustness replay (dev tool): local_verify against an sf0.1
dump, one subprocess per oracle with a HARD kill timeout (a safety net —
since the r9 inverted-index oracle rewrites, no oracle needs it; the
dedup family that used to take tens of minutes in DuckDB now runs in
single-digit seconds). Everything must PASS except the documented KLL
approximate-regime rows (KLL_ALLOWLIST); any other FAIL or any TIMEOUT
makes the exit status nonzero so scripted use cannot silently
green-light a regression. Writes a machine-readable summary to
<outDir>/replay_summary.json.

Usage: python3 tools/replay_sf01.py <outDir> <sfDir> [timeout_sec]
"""
import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

# The three sketches documented (README "10x-scale robustness replay") as
# leaving their provably-exact regime at sf0.1 (n >> k, ~0.1% rank error).
# Their error-bound-gated VERDICT-ROWS variants still must pass.
KLL_ALLOWLIST = {"sketch_quantile", "group_quantile_sketch",
                 "equi_depth_histogram"}


def provenance_stamp(protocol):
    """{git_sha, epoch_ms, protocol} for the summary artifact — same
    contract as graft.Provenance (sha gets -dirty on uncommitted edits)."""
    import subprocess
    try:
        sha = subprocess.run(["git", "rev-parse", "HEAD"],
                             capture_output=True, text=True,
                             timeout=10).stdout.strip()
        dirty = subprocess.run(["git", "status", "--porcelain"],
                               capture_output=True, text=True,
                               timeout=10).stdout.strip()
        if len(sha) != 40:
            sha = "unknown"
        elif dirty:
            sha += "-dirty"
    except Exception:
        sha = "unknown"
    return {"git_sha": sha, "epoch_ms": int(time.time() * 1000),
            "protocol": protocol}


# Arrow type -> DuckDB type, for the digest path's explicit casts (both
# sides must hash the same logical value under the same physical type).
ARROW_TO_DUCK = {
    "int8": "TINYINT", "int16": "SMALLINT", "int32": "INTEGER",
    "int64": "BIGINT", "float": "FLOAT", "double": "DOUBLE",
    "string": "VARCHAR", "large_string": "VARCHAR", "bool": "BOOLEAN",
    "date32[day]": "DATE", "timestamp[us]": "TIMESTAMP",
}


def check_one(out_dir, sf_dir, name, sql, q):
    import os
    import duckdb
    import pyarrow.dataset as pads
    from local_verify import register_views, rows_of
    res_path = Path(out_dir) / name
    try:
        ds = pads.dataset(str(res_path))
        n_spark = ds.count_rows()
    except Exception as e:
        q.put(("FAIL", f"spark result unreadable: {e}"))
        return
    # Results too large to materialize as python rows (the x100 LSH
    # candidate set is 215M rows; to_pydict on that OOM-kills the box)
    # are compared INSIDE DuckDB: count(*) + an order-independent
    # sum-of-row-hashes digest per side, streamed at bounded memory.
    # Multiset-equal results digest equal; a differing cell flips the
    # sum with collision probability ~2^-64.
    digest_rows = int(os.environ.get("REPLAY_DIGEST_ROWS", "5000000"))
    digest_mode = n_spark > digest_rows
    # The digest path needs an explicit per-column DuckDB expression. A
    # dtype outside ARROW_TO_DUCK (list/struct/map/...) gets to_json —
    # deterministic text for binary-equal values on BOTH sides (both are
    # DuckDB values: the spark result via read_parquet, the oracle via
    # its own SQL) — instead of the old fallback to the row-compare path,
    # which re-materialized the whole table and was exactly the exit -9
    # OOM mode the digest path exists to avoid (r12 advice). Wide
    # decimals are the one type whose to_json rendering could diverge
    # between engines (scale padding), but DtypeLint structurally bans
    # those from every emitted schema.
    stypes = {f.name: str(f.type) for f in ds.schema}
    fallback_note = ""

    def duck_expr(c):
        t = ARROW_TO_DUCK.get(stypes[c])
        return f'CAST("{c}" AS {t})' if t else f'to_json("{c}")'
    if not digest_mode:
        try:
            spark_tbl = ds.to_table().to_pydict()
        except Exception as e:
            q.put(("FAIL", f"spark result unreadable: {e}"))
            return
    con = duckdb.connect()
    # Large-scale replays (the ×100 oracle run) need explicit resource
    # bounds: an uncapped DuckDB gets OOM-killed (exit -9) instead of
    # spilling when other JVMs share the box, and its temp spill defaults
    # to ./.tmp on whatever volume cwd happens to be on.
    mem = os.environ.get("REPLAY_DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("REPLAY_DUCK_TEMP")
    if tmp:
        Path(tmp).mkdir(parents=True, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    register_views(con, sf_dir)
    if digest_mode:
        try:
            rel = con.sql(sql)  # binds lazily: schema without execution
            sn = sorted(f.name for f in ds.schema)
            dn = sorted(rel.columns)
            if sn != dn:
                q.put(("FAIL", f"schema: spark={sn} duck={dn}"))
                return
            cast = ", ".join(duck_expr(c) for c in sn)
            glob = "/*.parquet" if res_path.is_dir() else ""
            dig_s = con.execute(
                f"SELECT count(*), sum(hash({cast})) FROM "
                f"read_parquet('{res_path}{glob}')").fetchone()
            dig_d = con.execute(
                f"SELECT count(*), sum(hash({cast})) FROM ({sql})").fetchone()
        except Exception as e:
            q.put(("FAIL", f"digest compare error: {str(e)[:200]}"))
            return
        if dig_s[0] != dig_d[0]:
            q.put(("FAIL", f"rows: spark={dig_s[0]} duck={dig_d[0]}"))
        elif dig_s[1] != dig_d[1]:
            q.put(("FAIL", f"row-hash digest differs at {dig_s[0]} rows "
                   f"(spark {dig_s[1]} vs duck {dig_d[1]})"))
        else:
            q.put(("PASS", f"{dig_s[0]} rows, duckdb digest"))
        return
    try:
        duck_tbl = con.sql(sql).fetch_arrow_table().to_pydict()
    except Exception as e:
        q.put(("FAIL", f"oracle sql error: {str(e)[:200]}"))
        return
    sn, sr = rows_of(spark_tbl.keys(), spark_tbl)
    dn, dr = rows_of(duck_tbl.keys(), duck_tbl)
    if sn != dn:
        q.put(("FAIL", f"schema: spark={sn} duck={dn}"))
    elif len(sr) != len(dr):
        q.put(("FAIL", f"rows: spark={len(sr)} duck={len(dr)}"))
    elif sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:2]
        q.put(("FAIL", f"values differ, first diffs: {diffs}"))
    else:
        q.put(("PASS", f"{len(sr)} rows{fallback_note}"))


def main(out_dir, sf_dir, timeout_sec=150):
    import os
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    # REPLAY_ONLY=q1,q2: re-check just those queries and MERGE into an
    # existing replay_summary.json (per-query statuses updated in place,
    # aggregate counts recomputed) — the solo-retry path for oracles that
    # failed on box resources, not on values, during a full-surface run.
    only = {s.strip() for s in os.environ.get("REPLAY_ONLY", "").split(",")
            if s.strip()}
    if only:
        unknown = only - oracle.keys()
        assert not unknown, f"REPLAY_ONLY names not in oracle_sql: {unknown}"
        oracle = {k: v for k, v in oracle.items() if k in only}
    per_query = {}
    summary_path = Path(out_dir) / "replay_summary.json"
    if only and summary_path.exists():
        per_query = json.loads(summary_path.read_text()).get("queries", {})
    n_pass = n_fail = n_timeout = 0
    fails, timeouts, allowed = [], [], []
    for name, sql in sorted(oracle.items()):
        q = mp.Queue()
        proc = mp.Process(target=check_one,
                          args=(out_dir, sf_dir, name, sql, q))
        t0 = time.time()
        proc.start()
        proc.join(timeout_sec)
        elapsed = round(time.time() - t0, 1)
        if proc.is_alive():
            proc.terminate()
            proc.join(10)
            if proc.is_alive():
                proc.kill()
                proc.join()
            print(f"TIMEOUT {name} (oracle > {timeout_sec}s at sf0.1)",
                  flush=True)
            n_timeout += 1
            timeouts.append(name)
            per_query[name] = {"status": "TIMEOUT", "sec": elapsed}
            continue
        status, detail = q.get() if not q.empty() else \
            ("FAIL", f"worker died (exit {proc.exitcode})")
        if status == "PASS":
            n_pass += 1
        elif name in KLL_ALLOWLIST:
            status = "ALLOWED"
            allowed.append(name)
        else:
            n_fail += 1
            fails.append(name)
        per_query[name] = {"status": status, "sec": elapsed,
                           "detail": detail}
        print(f"{status} {name}: {detail}" if status != "PASS"
              else f"PASS {name} ({detail})", flush=True)
    # Aggregate counts come from the MERGED per-query map, so a subset
    # retry reports whole-run totals, not just the retried slice.
    statuses = {n: v.get("status") for n, v in per_query.items()}
    n_pass = sum(1 for s in statuses.values() if s == "PASS")
    n_fail = sum(1 for s in statuses.values() if s == "FAIL")
    n_timeout = sum(1 for s in statuses.values() if s == "TIMEOUT")
    allowed = sorted(n for n, s in statuses.items() if s == "ALLOWED")
    fails = sorted(n for n, s in statuses.items() if s == "FAIL")
    timeouts = sorted(n for n, s in statuses.items() if s == "TIMEOUT")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_timeout} timeout / "
          f"{len(allowed)} allowed-KLL")
    if fails:
        print("failing:", ", ".join(fails))
    summary = {"sf_dir": sf_dir, "timeout_sec": timeout_sec,
               **provenance_stamp("duckdb-oracle-replay"),
               "n_pass": n_pass, "n_fail": n_fail, "n_timeout": n_timeout,
               "allowed_kll": allowed, "failing": fails,
               "timing_out": timeouts, "queries": per_query}
    summary_path.write_text(json.dumps(summary, indent=1))
    # Timeouts count as failures for exit purposes: an unadjudicated cell
    # in the robustness matrix is not a pass.
    return 1 if (n_fail > 0 or n_timeout > 0) else 0


if __name__ == "__main__":
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    sys.exit(main(sys.argv[1], sys.argv[2], t))
