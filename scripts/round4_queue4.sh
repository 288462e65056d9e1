#!/bin/bash
# Round-4 TPU queue, part 4: rerun the grid_shared hybrid A/B (part-2 run
# crashed on a recon/HR grid mismatch in the quality metric — fixed in
# scripts/hybrid_e2e.py), then the full bench sweep with the round-4 lines.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/round4_queue results/round4_bench

log() { echo "$(date -u +%H:%M:%S) $*" >> /tmp/round4_queue/queue.log; }

run_job() {
  local name="$1" artifact="$2"; shift 2
  if [ -e "$artifact" ]; then
    log "$name: artifact exists, skip"
    return
  fi
  log "$name: start"
  timeout 3600 "$@" > "/tmp/round4_queue/$name.log" 2>&1
  log "$name: done ($?)"
}

run_job hybrid_shared results/round4_hybrid/e2e_shared.json \
  python scripts/hybrid_e2e.py --patients 3 \
    --arms grid_shared_restart grid_restart \
    --out results/round4_hybrid/e2e_shared.json

if [ ! -e results/round4_bench/all.jsonl ]; then
  log "bench_all: start"
  timeout 5400 python bench.py --all --no-torch \
    > results/round4_bench/all.jsonl 2> /tmp/round4_queue/bench_all.err
  log "bench_all: done ($?)"
fi
log "queue4 complete"
