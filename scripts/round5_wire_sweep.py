#!/usr/bin/env python
"""WIRE capacity/trainability sweep on the flagship workload (VERDICT r4
Next #5).

Round 4 recorded WIRE's quality plateau (47.8 dB final vs 70.4 for
siren+restart on the flagship LR ROI fit; −0.024 cohort SSIM) and blamed
"capacity" on an n=1 configuration. This sweep actually turns the knobs the
reference exposes (INRmodel.py:66-120):

  base          256x2, fixed omega0/sigma0 (the committed arm, fused kernel)
  trainable     256x2 with TRAINABLE per-layer omega0/sigma0
                (models/wire.py trainable=True = the reference's
                nn.Parameter behavior, INRmodel.py:70-84) — XLA path (the
                fused kernel fixes the scalars), so equal-WALL-CLOCK
                comparison is the fair one and both time axes are recorded
  w512_l2       512x2 fused      (width)
  w256_l3       256x3 fused      (depth)
  w512_l3       512x3 fused      (width+depth)
  lr1e-3        256x2 fused at 5x the lr (is the plateau an lr artifact?)

Each arm: chunked fit on the identical flagship target
(bench_quality.py's LR ROI volume), recording PSNR vs wall-clock (compile
excluded) up to --max_steps, plus time-to-{30,35,40} dB and the PSNR at
equal-wall-clock cutoffs. Writes results/round5_wire/sweep.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TARGETS = (30.0, 35.0, 40.0)
CUTOFFS_S = (5.0, 15.0, 30.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--max_steps", type=int, default=4000)
    ap.add_argument("--only", nargs="*", default=None,
                    help="run only these arm names (follow-up runs write to "
                    "a separate --out and are merged by the reader)")
    ap.add_argument("--out", default="results/round5_wire/sweep.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from mri_super_resolution_tpu.core.coords import mgrid
    from mri_super_resolution_tpu.data import expand_from_hybrid, load_mat, synthetic
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import Wire
    from mri_super_resolution_tpu.ops.pallas.wire_kernel import (
        make_wire_fused_apply,
        make_wire_value_and_grad,
        wire_kernel_fits,
    )
    from mri_super_resolution_tpu.pipelines.superres3d import normalize_hybrid

    # identical workload to bench_quality.py (flagship LR ROI fit)
    data_dir = os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data")
    b0 = np.asarray(load_mat(os.path.join(data_dir, "pat07_mean_b0.mat"),
                             "data_mean_b0"), dtype=np.float32)
    normed, _ = normalize_hybrid(synthetic.hybrid_from_b0(b0, seed=7))
    mean_img = np.asarray(expand_from_hybrid(normed, te=0)).mean(-1)
    lr = mean_img[40:90:2, 40:90:2]
    target = jnp.asarray(lr.reshape(-1, 1))
    coords = mgrid(lr.shape)
    data_range = float(lr.max() - lr.min())
    key = jax.random.key(0)
    on_tpu = jax.devices()[0].platform == "tpu"

    def run_arm(name, model, lr_opt, fused):
        params = model.init(key, coords[:8])
        # w512 backward overflows scoped VMEM (wire_kernel.wire_kernel_fits
        # docstring) — those arms measure the XLA-autodiff path
        if fused and on_tpu and wire_kernel_fits(model):
            apply_fn = make_wire_fused_apply(model)
            vag = make_wire_value_and_grad(model)
        else:
            apply_fn, vag = model.apply, None
            fused = False
        tx = optax.adam(lr_opt)
        # compile both chunk variants off the clock
        warm = fit_simple(apply_fn, tx, jax.tree.map(jnp.copy, params),
                          coords, target, args.chunk, value_and_grad_fn=vag)
        warm = fit_simple(apply_fn, tx, warm.params, coords, target,
                          args.chunk, value_and_grad_fn=vag,
                          opt_state=warm.opt_state)
        jax.device_get(warm.losses)

        p = jax.tree.map(jnp.copy, params)
        ostate = None
        elapsed, done = 0.0, 0
        curve, t_to = [], {}
        best = -1e9
        while done < args.max_steps:
            t0 = time.perf_counter()
            res = fit_simple(apply_fn, tx, p, coords, target, args.chunk,
                             value_and_grad_fn=vag, opt_state=ostate)
            loss = float(jax.device_get(res.losses[-1]))
            elapsed += time.perf_counter() - t0
            p, ostate = res.params, res.opt_state
            done += args.chunk
            psnr = (None if not np.isfinite(loss) else
                    10.0 * np.log10(data_range**2 / max(loss, 1e-30)))
            if psnr is not None:
                best = max(best, psnr)
                for t in TARGETS:
                    if t not in t_to and psnr >= t:
                        t_to[t] = {"seconds": round(elapsed, 2), "steps": done}
            curve.append({"steps": done, "wall_s": round(elapsed, 2),
                          "psnr": None if psnr is None else round(psnr, 2)})
        at_cutoff = {}
        for c in CUTOFFS_S:
            pts = [r["psnr"] for r in curve
                   if r["wall_s"] <= c and r["psnr"] is not None]
            at_cutoff[str(c)] = max(pts) if pts else None
        row = {
            "arm": name, "fused_kernel": bool(fused and on_tpu),
            "ms_per_step": round(1e3 * elapsed / done, 3),
            "targets": {str(k): v for k, v in t_to.items()},
            "psnr_at_wall_s": at_cutoff,
            "final_psnr": None if best < -1e8 else round(best, 2),
            "steps": done,
        }
        print(json.dumps(row), flush=True)
        return row

    arms = [
        ("base_256x2", Wire(hidden_features=256, hidden_layers=2), 5e-3, True),
        ("trainable_256x2",
         Wire(hidden_features=256, hidden_layers=2, trainable=True), 5e-3,
         False),
        ("w512_l2", Wire(hidden_features=512, hidden_layers=2), 5e-3, True),
        ("w256_l3", Wire(hidden_features=256, hidden_layers=3), 5e-3, True),
        ("w512_l3", Wire(hidden_features=512, hidden_layers=3), 5e-3, True),
        ("lr1e-3_256x2", Wire(hidden_features=256, hidden_layers=2), 1e-3,
         True),
        # follow-up arms (run with --only): winning knobs combined
        ("trainable_512x2",
         Wire(hidden_features=512, hidden_layers=2, trainable=True), 5e-3,
         False),
        ("lr1e-3_512x2", Wire(hidden_features=512, hidden_layers=2), 1e-3,
         False),
        ("lr1e-3_trainable_512x2",
         Wire(hidden_features=512, hidden_layers=2, trainable=True), 1e-3,
         False),
    ]
    if args.only is not None:
        want = set(args.only)
        arms = [a for a in arms if a[0] in want]
    rows = []
    for a in arms:
        try:
            rows.append(run_arm(*a))
        except Exception as e:  # record the failure, keep the sweep alive
            msg = str(e).splitlines()[0][:300]
            print(f"arm {a[0]} FAILED: {msg}", flush=True)
            rows.append({"arm": a[0], "error": msg})
    out = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "workload": "flagship LR ROI volume fit (bench_quality.py protocol)",
        "comparison_anchor": {
            "ff_siren_restart100_final": 70.36,
            "source": "results/round4_wire/time_to_psnr.jsonl",
        },
        "arms": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
