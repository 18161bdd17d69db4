#!/usr/bin/env python3
"""Rewrite a testdata scale dir with MULTI-ROW-GROUP parquet files.

The driver ships each sf* table as ONE parquet file with ONE row group, so
every leaf scan is structurally one Spark task (byte-range splits align to
row-group starts; a single group pins the whole file to one chunk). That is
the documented source of the profiler's leaf-only flag class since r8 —
real at this data layout, invisible on any production layout. This tool
rewrites each table with row groups sized for >= N_GROUPS groups on the big
tables so the sweep can be re-run on a splittable layout and the flag class
re-adjudicated with data (r15 punch item 8).

pyarrow (driver-side tooling, like local_verify's duckdb) rather than a
Spark rewrite: pyarrow preserves the exact physical schema — notably
events.ts TIMESTAMP(NANOS), which a Spark round-trip under nanosAsLong
would silently retype to INT64.

Usage: rowgroup_rewrite.py <src_sf_dir> <out_dir> [n_groups=8]
"""
import sys
from pathlib import Path

import pyarrow.parquet as pq

src = Path(sys.argv[1])
out = Path(sys.argv[2])
n_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 8
out.mkdir(parents=True, exist_ok=True)

for table_path in sorted(src.glob("*.parquet")):
    t = pq.read_table(table_path)
    rows = t.num_rows
    # ceil-div; tiny dims (region: 5 rows) keep 1 group — the point is the
    # BIG tables, and a 1-row row group per region row would be silly
    rg = max(1, -(-rows // n_groups))
    dest = out / table_path.name
    pq.write_table(t, dest, row_group_size=rg, compression="snappy")
    meta = pq.ParquetFile(dest).metadata
    print(f"{table_path.name}: {rows} rows -> {meta.num_row_groups} row groups "
          f"({dest.stat().st_size / 1e6:.1f} MB)")
