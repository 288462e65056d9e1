#!/usr/bin/env python
"""Cold-start tail attribution for cohort runs (VERDICT r4 Next #9).

Round 4's cohort A/B recorded first-patient prep of 182-292 s
(results/round4_presets/cohort_ab.json per_patient_timings) with warm
patients at 0.3 s. This script attributes it: run ONE patient through
superres3d.run_patient (quality preset shapes) in THIS process and report
the phase timings plus the persistent-cache state. The queue runs it twice
in fresh processes — if the second process shows warm-level prep, the
persistent XLA cache (mri_super_resolution_tpu/__init__._enable_compilation_cache)
covers the prep ops; if not, the residual is attributed (the leading
suspect: jax_persistent_cache_min_compile_time_secs=1.0 excludes the many
sub-second tiny-op compiles prep is made of, each paying a tunnel
round-trip).

Writes results/round5_coldstart/run<N>.json (N from --tag).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cache_stats(path):
    if not os.path.isdir(path):
        return {"entries": 0, "bytes": 0}
    names = os.listdir(path)
    return {"entries": len(names),
            "bytes": sum(os.path.getsize(os.path.join(path, n))
                         for n in names)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="1")
    ap.add_argument("--preset", default="quality")
    ap.add_argument("--out_dir", default="results/round5_coldstart")
    args = ap.parse_args()

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/mri_sr_tpu_xla"))
    before = cache_stats(cache_dir)

    t_import = time.perf_counter()
    import jax

    from mri_super_resolution_tpu.config import PRESETS, SupperresDWIConfig
    from mri_super_resolution_tpu.data import load_mat, synthetic
    from mri_super_resolution_tpu.pipelines import superres3d

    # attribute where process-local time goes: jax emits per-event durations
    # (backend_compile, cache retrieval/write, tracing) through
    # jax.monitoring — sum them by key for the whole run
    durations: dict = {}

    def _on_duration(key, dur, **kw):
        agg = durations.setdefault(key, [0, 0.0])
        agg[0] += 1
        agg[1] += dur

    jax.monitoring.register_event_duration_secs_listener(_on_duration)

    jax.devices()  # backend init on the clock
    backend_s = time.perf_counter() - t_import

    q = {k: v for k, v in PRESETS[args.preset].items()
         if k in {f.name for f in dataclasses.fields(SupperresDWIConfig)}}
    cfg = dataclasses.replace(SupperresDWIConfig(), **q)

    data_dir = os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data")
    b0 = np.asarray(load_mat(os.path.join(data_dir, "pat07_mean_b0.mat"),
                             "data_mean_b0"), dtype=np.float32)
    t_syn = time.perf_counter()
    hybrid = synthetic.hybrid_from_b0(b0, seed=7)
    synth_s = time.perf_counter() - t_syn

    res = superres3d.run_patient(hybrid, np.asarray((0.0, 150.0, 1000.0,
                                                     1500.0)), cfg,
                                 seed=0, pt_id="coldstart")
    after = cache_stats(cache_dir)
    out = {
        "tag": args.tag,
        "preset": args.preset,
        "platform": jax.devices()[0].platform,
        "backend_init_s": round(backend_s, 2),
        "synth_s": round(synth_s, 2),
        "timings": {k: round(v, 3) for k, v in res.timings.items()
                    if isinstance(v, float)},
        "cache_dir": cache_dir,
        "cache_before": before,
        "cache_after": after,
        "cache_min_compile_time_secs": float(
            os.environ.get("MRI_SR_CACHE_MIN_COMPILE_SECS", "1.0")),
        "event_durations_secs": {
            k: {"count": v[0], "total_s": round(v[1], 2)}
            for k, v in sorted(durations.items(),
                               key=lambda kv: -kv[1][1])[:12]},
    }
    os.makedirs(args.out_dir, exist_ok=True)
    path = os.path.join(args.out_dir, f"run{args.tag}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out), flush=True)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
