#!/usr/bin/env python3
"""10x-scale robustness replay (dev tool): local_verify against an sf0.1
dump, with a per-query ALARM timeout so the handful of deliberately
heavyweight oracles (minhash/gram families — tens of minutes in DuckDB
at sf0.1) report TIMEOUT instead of stalling the sweep. Everything else
must PASS except the documented KLL approximate-regime rows.

Usage: python3 tools/replay_sf01.py <outDir> <sfDir> [timeout_sec]
"""
import json
import signal
import sys
from pathlib import Path

import duckdb
import pyarrow.dataset as pads

sys.path.insert(0, str(Path(__file__).parent))
from local_verify import TABLES, rows_of  # noqa: E402


class Timeout(Exception):
    pass


def main(out_dir, sf_dir, timeout_sec=120):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_timeout = 0
    fails = []
    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(Timeout()))
    for name, sql in sorted(oracle.items()):
        res_dir = out / name
        try:
            spark_tbl = pads.dataset(str(res_dir)).to_table().to_pydict()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            fails.append(name)
            continue
        signal.alarm(timeout_sec)
        try:
            duck_tbl = con.sql(sql).fetch_arrow_table().to_pydict()
        except Timeout:
            print(f"TIMEOUT {name} (oracle > {timeout_sec}s at sf0.1 — "
                  "excluded by design)")
            n_timeout += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            n_fail += 1
            fails.append(name)
            continue
        finally:
            signal.alarm(0)
        sn, sr = rows_of(spark_tbl.keys(), spark_tbl)
        dn, dr = rows_of(duck_tbl.keys(), duck_tbl)
        if sn != dn:
            detail = f"schema: spark={sn} duck={dn}"
        elif len(sr) != len(dr):
            detail = f"rows: spark={len(sr)} duck={len(dr)}"
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:2]
            detail = f"values differ, first diffs: {diffs}"
        else:
            detail = None
        if detail is None:
            n_pass += 1
            print(f"PASS {name} ({len(sr)} rows)")
        else:
            n_fail += 1
            fails.append(name)
            print(f"FAIL {name}: {detail}")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_timeout} timeout")
    if fails:
        print("failing:", ", ".join(fails))
    return 0


if __name__ == "__main__":
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    sys.exit(main(sys.argv[1], sys.argv[2], t))
