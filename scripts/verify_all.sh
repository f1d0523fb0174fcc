#!/usr/bin/env bash
# Full-input env-gated verify: runs graft.Verify with a FRESH sbt launch
# (never `sbt -client` — the warm daemon keeps its launch-time environment,
# so a toggled GRAFT_PAIR_SAMPLE would be silently ignored), then the
# DuckDB oracle compare, writing a driver-format correctness artifact.
#
# Usage: scripts/verify_all.sh [sfdir] [outdir] [artifact.json]
#   GRAFT_PAIR_SAMPLE   (default 20) md5-bucket keep percentage applied
#                       identically to BOTH engines' inputs for the 28
#                       O(n²) pair queries (n02/n03/n13/n16/n23/n24/
#                       n25/n26/n52/n61/n80/n81/n85/n87/n89/n91/n92/
#                       n93/n94/n95/n96/s19/s34/s37/s38/s40/s41/s42) — bounds the
#                       DuckDB oracle, never the Spark plans. Export
#                       empty to disable.
set -euo pipefail
cd "$(dirname "$0")/.."

SFDIR="${1:-/root/testdata/sf0.1}"
OUTDIR="${2:-/tmp/verify_all_out}"
ARTIFACT="${3:-CORRECTNESS_SF01.json}"
# unset-only default (`-`, not `:-`): an exported-empty value must survive
# to the next line's unset branch, which is the documented disable path
export GRAFT_PAIR_SAMPLE="${GRAFT_PAIR_SAMPLE-20}"
if [ -z "$GRAFT_PAIR_SAMPLE" ]; then unset GRAFT_PAIR_SAMPLE; fi

echo "[verify_all] sfdir=$SFDIR outdir=$OUTDIR artifact=$ARTIFACT GRAFT_PAIR_SAMPLE=${GRAFT_PAIR_SAMPLE:-<unset>}"

# Mutation-experiment guard (round-19 lesson): a deliberately-broken line
# left in main source to prove a spec bites must NEVER reach a stamped
# artifact. Any `MUTATION` marker in src/main fails the run outright.
if grep -rn "MUTATION" src/main --include='*.scala'; then
  echo "[verify_all] FATAL: MUTATION marker(s) found in src/main — revert the experiment before stamping artifacts" >&2
  exit 1
fi

rm -rf "$OUTDIR"

# fresh JVM per run: --batch bypasses any warm daemon so the exported env
# is the env the Verify JVM actually sees (Verify logs pairSampleKeep)
sbt --batch "runMain graft.Verify $SFDIR $OUTDIR"

python3 scripts/verify_local.py "$SFDIR" "$OUTDIR" --json "$ARTIFACT"
