#!/bin/bash
# Round-4 TPU queue, part 2 (run after round4_queue.sh completes).
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

# zbucket demo re-run after the host-side aux/pad + z-bucketed-inference
# fixes (the first run, kept as zbucket_timings_prefix.json, showed 15-17 s
# of per-shape tiny-op compiles in setup and 4-15 s infer compiles)
run_job zbucket results/round4_presets/zbucket_timings.json \
  python scripts/zbucket_compile_demo.py
# re-run of the symmetric-split cohort A/B (first attempt crashed on the
# wire arm: PN phase differentiated through the VJP-less fused forward;
# fixed in superres3d to use the XLA apply for the engine)
run_job cohort_ab results/round4_presets/cohort_ab.json \
  python scripts/preset_cohort_ab.py --patients 10 --wire
# low-noise-GT variant of the preset cohort A/B: the symmetric 3+3 split's
# GT is noisy enough that masked SSIM's variance term biases toward the
# (noisier) spline arm; 9 held-out acquisitions cut GT noise 1.7x
run_job cohort_ab_cleangt results/round4_presets/cohort_ab_cleangt.json \
  python scripts/preset_cohort_ab.py --patients 10 --wire --acq_heldout 9 \
    --out results/round4_presets/cohort_ab_cleangt.json
# pia roofline re-run: v1's scan let XLA hoist the loop-invariant encode
# (impossible 855%-of-roofline numbers, kept as roofline_v1_licm_bug.json);
# the input is now loop-carried
run_job pia_roofline results/round4_pia/roofline.json \
  python scripts/pia_roofline.py
# B=64 broke the 8-32 plateau (588 vs ~400 patches/s, 57% of the lane
# roofline) — probe the tail of the curve
run_job rams_sweep_hi results/round4_rams/batch_sweep_hi.json \
  python scripts/rams_batch_sweep.py --batches 64 96 128 \
    --out results/round4_rams/batch_sweep_hi.json
# hybrid grid_shared arm: timing + recon-quality vs the per-TE arms
run_job hybrid_shared results/round4_hybrid/e2e_shared.json \
  python scripts/hybrid_e2e.py --patients 3 \
    --arms grid_shared_restart grid_restart \
    --out results/round4_hybrid/e2e_shared.json
log "queue2 complete"
