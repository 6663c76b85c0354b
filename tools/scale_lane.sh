#!/usr/bin/env bash
# Native-scale measurement lane (round 12, VERDICT item 7): one command that
# regenerates the native-cardinality fixture (graft.tools.SfGen — dbgen-style
# deterministic synthesizer, no replication caveat) and runs the FULL bench
# map against it on the canonical sbt-forked basis (build.sbt's JDK-17
# add-opens; a bare `java -cp` run puts Spark into its no-Unsafe fallback and
# invalidates the numbers — BENCH_NOTES round 11).
#
# The saturation guard runs in ROUTE mode here: the synthetic fixture is
# vocabulary-saturated by construction, where the exact-pair family
# (d3/d7/x5/d10) now auto-routes to its capped shapes instead of being
# excluded via SPARK_GRAFT_SKIP (the round-11 workaround). The official
# sf0.1 bench keeps the default fail-fast guard and a healthy corpus.
#
#   tools/scale_lane.sh [sf] [dataDir]
#
# Output: bench JSON at /tmp/graft_sf<sf>_bench/bench.json (full per-query
# map); the one-line headline JSON prints on stdout.
set -euo pipefail
SF="${1:-1.0}"
OUT="${2:-/tmp/graft_sf$SF}"
cd "$(dirname "$0")/.."

if [ ! -f "$OUT/documents.parquet/_SUCCESS" ]; then
  echo "generating native sf=$SF fixture at $OUT ..."
  sbt -batch "Test/runMain graft.tools.SfGen $SF $OUT"
fi

# Calibration refs are PER-FIXTURE (the block runs on this lane's own
# tables, not the driver testdata): without a pinned ref the loaded-stamp
# discipline (calib > 1.5x ref) would compare the native fixture's block
# against the sf0.1 ref and stamp every lane record loaded. 9.4 is the
# quietest same-box sf1.0/local[32] reading (round 18); override per box.
SPARK_GRAFT_SF_DIR="$OUT" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
SPARK_GRAFT_SATURATION_MODE=route \
SPARK_GRAFT_CALIB_REF="${SPARK_GRAFT_CALIB_REF:-9.4}" \
SPARK_GRAFT_CALIB_SEG_REF="${SPARK_GRAFT_CALIB_SEG_REF:-0.57}" \
SPARK_GRAFT_OUT="/tmp/graft_sf${SF}_bench" \
  sbt -batch "runMain graft.Bench"

echo "full map: /tmp/graft_sf${SF}_bench/bench.json"
