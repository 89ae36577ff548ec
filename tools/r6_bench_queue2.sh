#!/bin/bash
# Round-6 stage-2 measurement queue: runs after r6_bench_queue.sh drains.
# 1. serve_latency re-run with the content-pushdown row added
# 2. one interleaved local-cluster scaling pass (N=1 then N=4 executors)
#    on the shipped r6 code — refreshes the N->4N evidence
set -u
cd /root/repo

echo "[q2] waiting for stage-1 queue..."
while pgrep -f "r6_bench_queue.sh" | grep -v $$ > /dev/null; do sleep 30; done
echo "[q2] stage 1 done at $(date)"

run() {
  name=$1; shift
  echo "[q2] START $name at $(date)"
  timeout 5400 "$@" > "/tmp/r6_q2_${name}.log" 2>&1
  echo "[q2] END $name rc=$? at $(date)"
}

run serve_latency_pd python tools/serve_latency.py 3840000 --runs 3
run scale_n1 env SPARK_GRAFT_CLUSTER=1 python tools/build_job.py 1 1920000
run scale_n4 env SPARK_GRAFT_CLUSTER=1 python tools/build_job.py 4 1920000

echo "[q2] ALL DONE at $(date)"
