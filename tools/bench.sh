#!/usr/bin/env bash
# Bench wrapper guaranteeing the bench JSON is the ABSOLUTE LAST stdout
# line regardless of any build-tool epilogue: run the sbt bench, then cat
# the atomically-written bench_out.json. Usage mirrors the raw command:
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/bench.sh
# (build.sbt also sets showSuccess := false so the raw sbt invocation's
# last line is the same JSON — this wrapper is the belt-and-suspenders
# contract for harnesses that capture more than the tail.)
set -o pipefail
cd "$(dirname "$0")/.."
OUT="${SPARK_GRAFT_BENCH_OUT:-bench_out.json}"
sbt -batch "runMain graft.Bench" 1>&2
rc=$?
[ -f "$OUT" ] && cat "$OUT"
exit $rc
