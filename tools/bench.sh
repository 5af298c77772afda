#!/usr/bin/env bash
# Bench wrapper for the round driver: every byte of sbt/Spark noise goes to
# stderr; stdout carries EXACTLY ONE line — the JSON bench record. The bare
# `sbt 'runMain graft.Bench'` stdout (record line wrapped in [info]/[success]
# sbt framing) front-truncated the driver's capture window in rounds 8/9
# (BENCH_r08/r09 "parsed": null); reading the record back from the scratch
# file Bench writes sidesteps line-framing entirely.
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
