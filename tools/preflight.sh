#!/usr/bin/env bash
# Pre-snapshot guard: a red compile committed at a round boundary silently
# voids every downstream signal (correctness oracle, bench, judge) for that
# round AND the next one — exactly what happened in rounds 6-7, when a
# one-line rename break sat undetected behind two snapshots. Run this before
# every end-of-round commit; it fails fast if main or test sources don't
# compile.
#
# Usage:  tools/preflight.sh          # compile gate only (~30 s warm)
#         tools/preflight.sh --test   # compile gate + full ScalaTest suite
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preflight] sbt Test/compile ..."
sbt -batch Test/compile

if [[ "${1:-}" == "--test" ]]; then
  echo "[preflight] sbt test ..."
  sbt -batch test
fi

echo "[preflight] OK — safe to snapshot."
