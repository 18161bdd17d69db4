#!/usr/bin/env python3
"""Hash-compare two graft.Verify parquet dumps query-by-query (dev tool).

Driving case (r11): the single-JVM x100 dump vs the same queries dumped
under `local-cluster[4,8,24576]` — 4 executor JVMs x 24g instead of one
96g heap — to test the README claim that the x100 iterative-graph memory
cliff is a single-box sizing artifact a scale-out cluster absorbs by
construction. Identical row multisets (order- and partitioning-
independent md5 over sorted rows) = the plans are deterministic across
process topologies.

Usage: python3 tools/compare_dumps.py <dumpA> <dumpB> [q1,q2,...]
Compares every query dir present in BOTH dumps unless a subset is given.
Exit nonzero on any mismatch or unreadable result.
"""
import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))


# Above this row count, don't materialize python rows (the exact exit -9
# OOM mode replay_sf01.py hit at 215M rows) — digest inside DuckDB
# instead: count(*) + order-independent sum(hash(cols)), streamed at
# bounded memory (r12 advice).
DIGEST_ROWS = int(__import__("os").environ.get("COMPARE_DIGEST_ROWS",
                                               "5000000"))


def row_hash(dump, name):
    import pyarrow.dataset as pads
    ds = pads.dataset(str(Path(dump) / name))
    cols = sorted(ds.schema.names)
    n = ds.count_rows()
    if n > DIGEST_ROWS:
        import duckdb
        collist = ", ".join(f'"{c}"' for c in cols)
        dig = duckdb.sql(
            f"SELECT sum(hash({collist})) FROM "
            f"read_parquet('{Path(dump) / name}/*.parquet')").fetchone()[0]
        return n, cols, f"duckdigest:{dig}"
    tbl = ds.to_table()
    pyd = tbl.select(cols).to_pydict()
    rows = sorted(
        repr(tuple(pyd[c][i] for c in cols)) for i in range(n))
    d = hashlib.md5()
    for r in rows:
        d.update(r.encode())
    return n, cols, d.hexdigest()


def main():
    a, b = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 3:
        names = [q.strip() for q in sys.argv[3].split(",") if q.strip()]
    else:
        def qdirs(d):
            return {p.name for p in Path(d).iterdir()
                    if p.is_dir() and not p.name.startswith((".", "_"))}
        names = sorted(qdirs(a) & qdirs(b))
    bad = []
    out = {}
    for name in names:
        try:
            na, ca, ha = row_hash(a, name)
            nb, cb, hb = row_hash(b, name)
        except Exception as e:
            bad.append(name)
            out[name] = {"match": False, "err": str(e)[:200]}
            print(f"[compare] {name}: ERROR {e}")
            continue
        ok = (na == nb and ca == cb and ha == hb)
        out[name] = {"match": ok, "rows_a": na, "rows_b": nb,
                     "hash_a": ha, "hash_b": hb}
        if not ok:
            bad.append(name)
        print(f"[compare] {name}: rows {na} vs {nb} "
              f"{'MATCH' if ok else 'MISMATCH'}")
    print(json.dumps(out, indent=1))
    if bad:
        print(f"[compare] MISMATCHES: {', '.join(bad)}", file=sys.stderr)
        sys.exit(1)
    print(f"[compare] all {len(names)} queries hash-identical")


if __name__ == "__main__":
    main()
