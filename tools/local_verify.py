#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev tool only — the
library itself is pure Scala/Spark; this script just replays the DuckDB
oracle compare so we can iterate without waiting for the driver round).

Usage: python3 tools/local_verify.py <outDir> <sfDir>
  where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query: loads outDir/<name> (Spark parquet result) and runs
oracle_sql.json[<name>] in DuckDB with each table registered as a view over
<sfDir>/<table>.parquet. Compares row count, sorted-by-name column sets, and
exact cell values on rows sorted by all columns.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def register_views(con, sf_dir):
    """CREATE VIEW per table over <sfDir>/<t>.parquet — which is a single
    file for the driver testdata but a Spark-written DIRECTORY of part
    files for ReplicateScale output (the ×N stress replicas), so glob the
    dir form."""
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def rows_of(cols, table):
    # table: dict col -> list of python values; sort columns by name, then rows
    names = sorted(cols)
    data = list(zip(*[[norm(v) for v in table[c]] for c in names])) if names else []
    return names, sorted(data)


def main(out_dir, sf_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    register_views(con, sf_dir)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = out / name
        status, detail = "PASS", ""
        try:
            spark_tbl = pads.dataset(str(res_dir)).to_table().to_pydict()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            duck = con.sql(sql)
            duck_tbl = duck.fetch_arrow_table().to_pydict()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            n_fail += 1
            continue
        # advisory: physical arrow types (driver may or may not compare these)
        stypes = {f.name: str(f.type) for f in pads.dataset(str(res_dir)).schema}
        dtypes = {f.name: str(f.type) for f in duck.fetch_arrow_table().schema}
        tdiff = {c: (stypes.get(c), dtypes.get(c))
                 for c in set(stypes) | set(dtypes) if stypes.get(c) != dtypes.get(c)}
        if tdiff:
            print(f"  [type-diff] {name}: {tdiff}")
        sn, sr = rows_of(spark_tbl.keys(), spark_tbl)
        dn, dr = rows_of(duck_tbl.keys(), duck_tbl)
        if sn != dn:
            status, detail = "FAIL", f"schema: spark={sn} duck={dn}"
        elif len(sr) != len(dr):
            status, detail = "FAIL", f"rows: spark={len(sr)} duck={len(dr)}"
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            status, detail = "FAIL", f"values differ, first diffs: {diffs}"
        if status == "PASS":
            n_pass += 1
            print(f"PASS {name} ({len(sr)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {detail}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
