#!/usr/bin/env bash
# Bench wrapper for the round driver: every byte of sbt/Spark noise goes to
# stderr; stdout carries EXACTLY ONE line — the COMPACT JSON bench record
# (total, failures, stream probe, the 40 BASELINE.md contract queries;
# ~1.5 KB, guaranteed inside any tail-capture window). The bare
# `sbt 'runMain graft.Bench'` stdout (a ~5 KB record line wrapped in
# [info]/[success] sbt framing) front-truncated the driver's capture window
# in rounds 8–10 ("parsed": null). The FULL 167-entry record lands in
# target/bench_full.json per run and is committed as BENCH_LOCAL.json at
# sf0.1.
#
# Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/bench.sh
set -u
cd "$(dirname "$0")/.."
rm -f target/bench_last.json
sbt -batch 'runMain graft.Bench' 1>&2
status=$?
if [ "$status" -eq 0 ] && [ -f target/bench_last.json ]; then
  cat target/bench_last.json
else
  echo "{\"metric\":\"total\",\"value\":-1,\"unit\":\"sec\",\"error\":\"bench run failed rc=$status\"}"
  exit 1
fi
