#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/verify_local.py [sfdir] [outdir] [--json PATH]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran (or run
with --run to invoke it — NOTE --run uses the warm `sbt -client` daemon,
which keeps its LAUNCH-TIME environment: env-gated verifies such as
GRAFT_PAIR_SAMPLE must go through scripts/verify_all.sh, which launches a
fresh sbt). For each query result parquet under outdir, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same fixture tables,
canonicalizes both sides (columns sorted by name, rows sorted by all
columns, values stringified) and diffs. --json writes a driver-format
per-query artifact (rows/schema/hash match booleans).
"""
import json, os, subprocess, sys

import duckdb

_argv = sys.argv[1:]
JSON_OUT = None
if "--json" in _argv:
    i = _argv.index("--json")
    JSON_OUT = _argv[i + 1]
    _argv = _argv[:i] + _argv[i + 2:]
_pos = [a for a in _argv if not a.startswith("--")]
SFDIR = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.01"
OUTDIR = _pos[1] if len(_pos) > 1 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_df(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(tuple(canon_val(v) for v in row) for row in df.itertuples(index=False))
    return cols, rows


def canon(con, rel_sql):
    return canon_df(con.execute(rel_sql).fetchdf())


def canon_parquet(path_glob):
    """Spark-side canon via pyarrow (NOT duckdb): the driver reads the
    result parquet with pyarrow, which keeps DECIMAL as decimal.Decimal
    ('3.750000') where duckdb fetchdf converts to float64 ('3.75') —
    reading both sides through duckdb masked exactly the r01 decimal
    hash mismatches. Mimic the driver's asymmetry."""
    import glob
    import pandas as pd
    import pyarrow.parquet as pq
    parts = [pq.read_table(p).to_pandas() for p in sorted(glob.glob(path_glob))]
    return canon_df(pd.concat(parts, ignore_index=True))


def canon_val(v):
    if v is None:
        return "NULL"
    try:
        import math
        if isinstance(v, float) and math.isnan(v):
            return "NULL"
    except Exception:
        pass
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main():
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-client", f'runMain graft.Verify {SFDIR} {OUTDIR}'],
                       check=True, cwd="/root/repo")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")
    with open(os.path.join(OUTDIR, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    jrec = {}  # driver-format per-query record for --json
    # VERIFY_SKIP_ORACLE: comma-separated query names downgraded to a
    # rows-only check — for large SFs where the DUCKDB side of an
    # O(n^2) pair oracle is the bottleneck (the Spark side is fine)
    skip_oracle = set(filter(None, os.environ.get("VERIFY_SKIP_ORACLE", "").split(",")))
    names = sorted(d for d in os.listdir(OUTDIR)
                   if os.path.isdir(os.path.join(OUTDIR, d)))
    for name in names:
        if name in skip_oracle:
            got_cols, got = canon_parquet(f"{OUTDIR}/{name}/*.parquet")
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" EMPTY!" if not got else "")
            jrec[name] = {"rows_match": bool(got), "schema_match": None,
                          "hash_match": None, "spark_rows": len(got),
                          "oracle_rows": None, "err": None}
            continue
        got_cols, got = canon_parquet(f"{OUTDIR}/{name}/*.parquet")
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" EMPTY!" if not got else "")
            jrec[name] = {"rows_match": bool(got), "schema_match": None,
                          "hash_match": None, "spark_rows": len(got),
                          "oracle_rows": None, "err": None}
            continue
        try:
            exp_cols, exp = canon(con, oracles[name])
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            jrec[name] = {"rows_match": False, "schema_match": False,
                          "hash_match": False, "spark_rows": len(got),
                          "oracle_rows": None, "err": f"oracle sql error: {e}"}
            continue
        jrec[name] = {"rows_match": len(got) == len(exp),
                      "schema_match": got_cols == exp_cols,
                      "hash_match": got == exp,
                      "spark_rows": len(got), "oracle_rows": len(exp),
                      "err": None}
        if got_cols != exp_cols:
            results[name] = f"SCHEMA_MISMATCH spark={got_cols} oracle={exp_cols}"
        elif len(got) != len(exp):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(got)} oracle={len(exp)}"
        elif got != exp:
            bad = next(i for i, (a, b) in enumerate(zip(got, exp)) if a != b)
            results[name] = f"VALUE_MISMATCH first at row {bad}:\n  spark={got[bad]}\n  duck ={exp[bad]}"
        else:
            results[name] = f"OK rows={len(got)}"
    missing = set(oracles) - set(names)
    for m in sorted(missing):
        results[m] = "NO_RESULT_PARQUET"
        jrec[m] = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": 0, "oracle_rows": None,
                   "err": "no result parquet (query failed in graft.Verify)"}
    # registry coverage is part of the PASS/FAIL loop, not just a
    # warning: a declared query with no oracle AND no result parquet
    # (neither in `names` nor in `missing`) must fail the gate, or the
    # script could exit 0 while the declared surface is uncovered
    registry = None
    registry_covered = None
    # n_queries is the VERIFIED surface (results + missing-oracle rows,
    # i.e. everything graft.Verify actually emitted) — captured BEFORE
    # synthetic NOT_IN_ARTIFACT rows are inserted below, so the meta
    # invariant stays self-describing: n_queries == n_registry AND
    # n_synthetic_fail == 0 proves the refresh covered the declared
    # surface (ADVICE r16: post-insertion len(jrec) always equals
    # n_registry, even when uncovered).
    n_queries = len(jrec)
    n_synthetic_fail = 0
    reg_path = os.path.join(OUTDIR, "registry.json")
    if os.path.exists(reg_path):
        with open(reg_path) as f:
            registry = json.load(f)
        registry_covered = sorted(registry) == sorted(jrec)
        n_synthetic_fail = len(set(registry) - set(jrec))
        for m in sorted(set(registry) - set(jrec)):
            results[m] = "NOT_IN_ARTIFACT (declared in registry; no result, no oracle)"
            jrec[m] = {"rows_match": False, "schema_match": False,
                       "hash_match": False, "spark_rows": 0,
                       "oracle_rows": None,
                       "err": "declared query missing from verify output"}
    if JSON_OUT:
        # stamp the producing HEAD + query count so the artifact is
        # self-describing: row count == n_queries proves the refresh
        # covered the whole declared surface at that commit
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        try:
            # --dirty: an artifact produced from uncommitted code must
            # not be stamped with a clean-looking commit
            head = subprocess.run(["git", "describe", "--always", "--dirty"],
                                  capture_output=True, text=True,
                                  cwd=repo).stdout.strip() or None
        except Exception:
            head = None
        # surface coverage proof: compare against the DECLARED registry
        # (loaded above, where uncovered entries already became FAIL rows)
        meta = {"sfdir": SFDIR,
                "pair_sample": os.environ.get("GRAFT_PAIR_SAMPLE"),
                "skip_oracle": sorted(skip_oracle),
                "git_head": head,
                "n_queries": n_queries,
                "n_synthetic_fail": n_synthetic_fail,
                "n_registry": len(registry) if registry is not None else None,
                "registry_covered": registry_covered}
        if registry_covered is False:
            extra = sorted(set(jrec) - set(registry))
            print(f"WARNING: artifact does not cover declared registry "
                  f"(uncovered entries are FAIL rows above; extra={extra})")
        with open(JSON_OUT, "w") as f:
            json.dump({"_meta": meta, **{k: jrec[k] for k in sorted(jrec)}},
                      f, indent=2)
        print(f"wrote {JSON_OUT}")
    width = max(len(n) for n in results)
    nok = 0
    for n in sorted(results):
        ok = results[n].startswith("OK") or results[n].startswith("ROWS_ONLY rows=") and "EMPTY" not in results[n]
        nok += ok
        print(f"{'PASS' if ok else 'FAIL'} {n:<{width}} {results[n]}")
    print(f"== {nok}/{len(results)} pass")
    sys.exit(0 if nok == len(results) else 1)


if __name__ == "__main__":
    main()
