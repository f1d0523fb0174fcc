#!/usr/bin/env python3
"""Compare two graft.Verify output dirs query-by-query (driver-side tool).

Used for A/B fixture experiments (e.g. single- vs mixed-generation
events): both dirs must hold the same query subdirs of parquet dumps;
each pair is compared exactly — columns sorted by name, rows sorted,
values stringified — the same canonicalization the driver's oracle
compare uses.

Usage: python3 scripts/compare_dumps.py dirA dirB
"""
import os
import sys

import duckdb

a, b = sys.argv[1], sys.argv[2]
names = sorted(d for d in os.listdir(a)
               if os.path.isdir(os.path.join(a, d)))
fail = 0
for n in names:
    if not os.path.isdir(os.path.join(b, n)):
        print(f"MISS {n}: absent in {b}")
        fail += 1
        continue
    con = duckdb.connect()
    ra = con.execute(
        f"SELECT * FROM read_parquet('{a}/{n}/*.parquet')").fetchdf()
    rb = con.execute(
        f"SELECT * FROM read_parquet('{b}/{n}/*.parquet')").fetchdf()
    ra = ra[sorted(ra.columns)]
    rb = rb[sorted(rb.columns)]
    ka = sorted(map(str, ra.itertuples(index=False, name=None)))
    kb = sorted(map(str, rb.itertuples(index=False, name=None)))
    if list(ra.columns) != list(rb.columns):
        print(f"FAIL {n}: columns {list(ra.columns)} vs {list(rb.columns)}")
        fail += 1
    elif ka != kb:
        first = next((i for i, (x, y) in enumerate(zip(ka, kb)) if x != y),
                     min(len(ka), len(kb)))
        print(f"FAIL {n}: rows {len(ka)} vs {len(kb)}; first diff @{first}:")
        print(f"  A: {ka[first] if first < len(ka) else '<none>'}")
        print(f"  B: {kb[first] if first < len(kb) else '<none>'}")
        fail += 1
    else:
        print(f"PASS {n} rows={len(ka)}")
print(f"== {len(names) - fail}/{len(names)} match")
sys.exit(1 if fail else 0)
