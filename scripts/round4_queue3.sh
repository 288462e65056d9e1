#!/bin/bash
# Round-4 TPU queue, part 3: the full bench sweep with the round-4 lines
# (serving latency, RAMS 25-draw inference, amortized PIA) on the real chip.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/round4_queue results/round4_bench

log() { echo "$(date -u +%H:%M:%S) $*" >> /tmp/round4_queue/queue.log; }

if [ ! -e results/round4_bench/all.jsonl ]; then
  log "bench_all: start"
  timeout 3600 python bench.py --all --no-torch \
    > results/round4_bench/all.jsonl 2> /tmp/round4_queue/bench_all.err
  log "bench_all: done ($?)"
fi
log "queue3 complete"
