#!/bin/bash
# Round-4 TPU evidence queue: runs the remaining TPU jobs in order once the
# chip is free, logging to /tmp/round4_queue/. Each job skips itself if its
# output artifact already exists. Safe to re-run.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/round4_queue

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

run_job cohort_ab results/round4_presets/cohort_ab.json \
  python scripts/preset_cohort_ab.py --patients 10 --wire
run_job zbucket results/round4_presets/zbucket_timings.json \
  python scripts/zbucket_compile_demo.py
run_job rams_sweep results/round4_rams/batch_sweep.json \
  python scripts/rams_batch_sweep.py
run_job pia_roofline results/round4_pia/roofline.json \
  python scripts/pia_roofline.py
run_job bench_quality results/round4_wire/time_to_psnr.jsonl \
  sh -c 'mkdir -p results/round4_wire && python bench_quality.py > results/round4_wire/time_to_psnr.jsonl'
log "queue complete"
