#!/bin/bash
# TPU-recovery work queue (round-3 continuation). Probes the tunnel; when
# jax.devices() answers within the timeout, runs the queued TPU jobs in
# order, logging to /tmp/tpu_queue/. Safe to re-run; each job skips itself
# if its output artifact already exists.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue

probe() {
  timeout 300 python -c "import jax; assert jax.devices()" 2>/dev/null
}

echo "$(date -u +%H:%M:%S) probing TPU..." >> /tmp/tpu_queue/queue.log
until probe; do
  echo "$(date -u +%H:%M:%S) tunnel still down" >> /tmp/tpu_queue/queue.log
  sleep 120
done
echo "$(date -u +%H:%M:%S) TPU UP — running queue" >> /tmp/tpu_queue/queue.log

# 1. multi-seed optimizer sweep (minutes on TPU)
if [ ! -f results/round3_flagship/fast_fit_seeds.json ]; then
  timeout 3600 python -u scripts/fast_fit_exp.py --seeds 5 \
    --out results/round3_flagship/fast_fit_seeds.json \
    > /tmp/tpu_queue/fast_fit.log 2>&1
  echo "$(date -u +%H:%M:%S) fast_fit done ($?)" >> /tmp/tpu_queue/queue.log
fi

# 2. experimental Pallas RFAB conv A/B (forward, short)
if [ ! -f results/round3_rams/conv_kernel_ab.json ]; then
  timeout 1800 python -u scripts/conv_kernel_bench.py \
    > /tmp/tpu_queue/conv_ab.log 2>&1
  echo "$(date -u +%H:%M:%S) conv A/B done ($?)" >> /tmp/tpu_queue/queue.log
fi

# 3. warm bench line (sanity for the driver's end-of-round run)
timeout 3600 python -u bench.py > /tmp/tpu_queue/bench.log 2>&1
echo "$(date -u +%H:%M:%S) bench done ($?)" >> /tmp/tpu_queue/queue.log

# 4. leak-free RAMS retrain: patient-held-out split, from scratch config of
#    the committed artifact; gives the TRUE held-out generalization number
if [ ! -f /tmp/tpu_queue/rams_holdout_train.done ]; then
  timeout 28800 python -u cli/train_misr.py --epochs 40 --data_aug \
    --patches_per_slice 8 --split patient --holdout_patients 1 \
    --ckpt_dir /tmp/rams_holdout_ckpt --evaluate_every 20 \
    > /tmp/tpu_queue/rams_holdout_train.log 2>&1 \
    && touch /tmp/tpu_queue/rams_holdout_train.done
  echo "$(date -u +%H:%M:%S) rams holdout train done ($?)" >> /tmp/tpu_queue/queue.log
fi
echo "$(date -u +%H:%M:%S) queue complete" >> /tmp/tpu_queue/queue.log

# 5. whole-step conv_kernel A/B (only meaningful if step 2 showed a win)
if [ -f results/round3_rams/conv_kernel_ab.json ]; then
  timeout 1800 python -u scripts/profile_rams.py --no-trace --dtype bfloat16 \
    --conv_kernel > /tmp/tpu_queue/rams_convkernel_step.log 2>&1
  echo "$(date -u +%H:%M:%S) conv_kernel whole-step done ($?)" >> /tmp/tpu_queue/queue.log
fi
