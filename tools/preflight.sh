#!/usr/bin/env bash
# Round-close preflight — run before every PERF/SURVEY commit so a
# round can never be declared closed on a build that does not compile
# (round 4 shipped exactly that: a scaladoc `*/` broke the build and no
# validation ran all round).
#
#   tools/preflight.sh          # compile main + tests (fast structural gate)
#   tools/preflight.sh --full   # + graft.Verify at sf0.01 replayed in DuckDB
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch compile Test/compile

if [[ "${1:-}" == "--full" ]]; then
  python3 tools/check_local.py /root/testdata/sf0.01 /tmp/verify_out
fi
echo "preflight OK"
