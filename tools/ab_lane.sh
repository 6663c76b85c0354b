#!/usr/bin/env bash
# Same-box A/B lane (round 17, VERDICT r16 item 4): one command that benches
# HEAD's src against a given ref's src on the same box, minutes apart, and
# prints both JSON lines side by side. This is the decisive adjudication for
# "per-query regression vs a prior round's record" — cross-record comparisons
# at sub-second query scale are box-sensitive (r16: d3 1.27->3.1 "regression"
# reproduced identically under r15 code on the same box), so never chase a
# bench delta in code the diff never touched before running this.
#
#   tools/ab_lane.sh <ref> [sfDir]
#
# e.g. tools/ab_lane.sh ca015dd            # HEAD vs round-16 tag, sf0.1
#      tools/ab_lane.sh HEAD~3 /root/testdata/sf0.01
#
# DO NOT edit anything under src/ (or this script) while a run is live: the
# ref leg checks out <ref>'s src over the working tree and the restore leg
# checks out HEAD's — edits made after launch are clobbered by either leg
# (the dirty-src refusal below only protects edits that exist at launch).
#
# Read the calib_sec / seg_cal_max fields of both JSONs before trusting
# per-query movers: the legs run minutes apart and 20-30% ambient bursts
# happen (r17: a head leg at calib 5.34 vs the ref leg's 4.13 produced
# phantom 2x movers on pure-SQL queries the diff never touched; the rerun at
# matched calibs 4.88/4.89 read median 1.025 with those movers gone). If
# calibs disagree >10%, rerun; prefer per-query MINIMUMS across runs.
#
# Protocol (the exact manual sequence from BENCH_NOTES r16):
#   1. refuse to run with a dirty src/ (checkout -- src would destroy edits)
#   2. bench HEAD src            -> /tmp/graft_ab/head.json
#   3. git checkout <ref> -- src ; rebuild ; bench -> /tmp/graft_ab/ref.json
#   4. git checkout HEAD -- src  ; rebuild (restore)
# Both runs write their full per-query map under /tmp/graft_ab (never the
# repo's bench.json — SPARK_GRAFT_OUT is always set, so the committed
# round snapshot survives). Never run another sbt command concurrently:
# forked child JVMs load classes from target/classes mid-run.
set -euo pipefail
REF="${1:?usage: tools/ab_lane.sh <ref> [sfDir]}"
SF_DIR="${2:-/root/testdata/sf0.1}"
OUT=/tmp/graft_ab
cd "$(dirname "$0")/.."

if ! git diff --quiet -- src || ! git diff --cached --quiet -- src; then
  echo "refusing: src/ has uncommitted changes (checkout -- src would lose them)" >&2
  exit 1
fi
git rev-parse --verify --quiet "$REF^{commit}" >/dev/null ||
  { echo "refusing: '$REF' is not a commit" >&2; exit 1; }
mkdir -p "$OUT"

bench_once() { # $1 = label
  sbt -batch compile >/dev/null
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    SPARK_GRAFT_OUT="$OUT/$1" sbt -batch "runMain graft.Bench" >"$OUT/$1.log" 2>&1 ||
    { echo "bench failed for $1 — tail of $OUT/$1.log:" >&2; tail -5 "$OUT/$1.log" >&2; exit 1; }
  cp "$OUT/$1/bench.json" "$OUT/$1.json"
}

echo "[ab] benching HEAD src on $SF_DIR ..."
bench_once head

echo "[ab] benching $REF src on $SF_DIR ..."
git checkout "$REF" -- src
trap 'git checkout HEAD -- src; sbt -batch compile >/dev/null' EXIT
bench_once ref

git checkout HEAD -- src
sbt -batch compile >/dev/null
trap - EXIT

echo
echo "== A/B on $SF_DIR (same box, minutes apart) =="
echo "HEAD: $(python3 -c "import json;d=json.load(open('$OUT/head.json'));print(f\"{d['value']:.1f}s / {len(d['queries'])} queries\")")"
echo "$REF: $(python3 -c "import json;d=json.load(open('$OUT/ref.json'));print(f\"{d['value']:.1f}s / {len(d['queries'])} queries\")")"
python3 - "$OUT/head.json" "$OUT/ref.json" <<'EOF'
import json, sys
h, r = (json.load(open(p))["queries"] for p in sys.argv[1:3])
shared = sorted(set(h) & set(r))
ratios = sorted((h[q] / r[q], q) for q in shared if r[q] > 0)
import statistics
print(f"shared queries: {len(shared)}; median HEAD/ref ratio: "
      f"{statistics.median(x for x, _ in ratios):.3f}")
print("largest movers (HEAD/ref, only |delta| >= 0.3s shown):")
movers = [(x, q) for x, q in ratios if abs(h[q] - r[q]) >= 0.3]
for x, q in movers[:5] + ([] if len(movers) <= 10 else [("...", "")]) + movers[-5:]:
    if q:
        print(f"  {q}: {h[q]:.2f}s vs {r[q]:.2f}s ({x:.2f}x)")
EOF
echo "full maps: $OUT/head.json $OUT/ref.json"
