#!/usr/bin/env python3
"""Build a MIXED-GENERATION twin of an sf fixture dir (driver-side tool).

Copies/symlinks every table except events; events.parquet becomes a
DIRECTORY of two files spanning producer generations:
  gen-a-0.parquet  first half of rows, ts as raw INT64 nanoseconds
                   (the pre-r9 fixture encoding)
  gen-b-0.parquet  second half, ts as TIMESTAMP(micros, NTZ)
                   (the current fixture encoding)
Same logical rows as the source — a reader that normalizes per file
must return byte-identical query results vs the single-generation dir.

Usage: python3 scripts/make_mixed_events.py [src_sf_dir] [dst_dir]
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_mixed"

os.makedirs(dst, exist_ok=True)
for f in os.listdir(src):
    if f == "events.parquet" or not f.endswith(".parquet"):
        continue
    link = os.path.join(dst, f)
    if not os.path.exists(link):
        os.symlink(os.path.join(src, f), link)

t = pq.read_table(os.path.join(src, "events.parquet"))
ts = t.column("ts")
assert pa.types.is_timestamp(ts.type) and ts.type.unit == "us" \
    and ts.type.tz is None, f"expected NTZ micros source, got {ts.type}"

half = t.num_rows // 2
old, new = t.slice(0, half), t.slice(half)

# gen-a: ts -> raw INT64 nanoseconds (micros * 1000), no logical annotation
ns = pa.compute.multiply(old.column("ts").cast(pa.int64()), 1000)
old = old.set_column(t.schema.get_field_index("ts"), "ts", ns)

evdir = os.path.join(dst, "events.parquet")
os.makedirs(evdir, exist_ok=True)
pq.write_table(old, os.path.join(evdir, "gen-a-0.parquet"))
pq.write_table(new, os.path.join(evdir, "gen-b-0.parquet"))
print(f"wrote {evdir}: gen-a {old.num_rows} rows (int64 ns), "
      f"gen-b {new.num_rows} rows ({new.column('ts').type})")
