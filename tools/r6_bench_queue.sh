#!/bin/bash
# Round-6 measurement queue: waits for the running phrase_scale job, then
# runs the remaining benches sequentially so no two timed jobs contend.
# Logs to /tmp/r6_queue_*.log; each tool writes its own BENCH/ artifact.
set -u
cd /root/repo

echo "[queue] waiting for phrase_scale to finish..."
while pgrep -f "tools/phrase_scale.py" > /dev/null; do sleep 30; done
echo "[queue] phrase_scale done at $(date)"

run() {
  name=$1; shift
  echo "[queue] START $name at $(date)"
  timeout 5400 python "$@" > "/tmp/r6_queue_${name}.log" 2>&1
  echo "[queue] END $name rc=$? at $(date)"
}

run cc_skew        tools/cc_skew.py --runs 2
run serve_latency  tools/serve_latency.py 3840000 --runs 3
run hybrid_scale   tools/hybrid_scale.py 3840000 --runs 2
run wand_sweep     tools/wand_crossover.py 3840000 --sweep --runs 2
run bench_sf01     bench.py

echo "[queue] ALL DONE at $(date)"
