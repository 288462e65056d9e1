#!/usr/bin/env python
"""Time-to-PSNR benchmark: wall-clock to reach fit-quality targets on the
flagship 3-D volume workload (BASELINE.json north-star metric #2).

Fits the LR ROI volume of a (synthesised) pat07 hybrid with:
  - the reference architecture (FF-SIREN 2*128 -> 512x3, Adam 1e-4), and
  - the GridINR multiresolution dense-grid model (this framework's addition),
recording wall-clock (compile excluded) to cross PSNR thresholds.

Prints one JSON line per model.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

TARGETS = (30.0, 35.0, 40.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=100, help="steps per timing chunk")
    ap.add_argument("--max_steps", type=int, default=3000)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.max_steps = 400

    import jax
    import jax.numpy as jnp
    import optax

    from mri_super_resolution_tpu.core.coords import fourier_matrix, fourier_encode, mgrid
    from mri_super_resolution_tpu.data import load_mat, synthetic
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import Siren, GridINR
    from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
        make_fused_apply,
        make_fused_value_and_grad,
    )

    # workload: LR ROI volume mean of synthesized pat07 hybrid
    data_dir = os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data")
    b0_path = os.path.join(data_dir, "pat07_mean_b0.mat")
    if os.path.exists(b0_path):
        b0 = np.asarray(load_mat(b0_path, "data_mean_b0"), dtype=np.float32)
    else:
        b0 = np.abs(np.random.default_rng(0).normal(1, 0.3, (128, 128, 28))).astype(np.float32)
    hybrid = synthetic.hybrid_from_b0(b0, seed=7)
    from mri_super_resolution_tpu.pipelines.superres3d import normalize_hybrid
    from mri_super_resolution_tpu.data import expand_from_hybrid

    normed, _ = normalize_hybrid(hybrid)
    mean_img = np.asarray(expand_from_hybrid(normed, te=0)).mean(-1)
    lr = mean_img[40:90:2, 40:90:2]  # (25, 25, S, 4)
    target = jnp.asarray(lr.reshape(-1, 1))
    coords = mgrid(lr.shape)
    data_range = float(lr.max() - lr.min())

    def run_model(name, apply_fn, params, tx, vag=None):
        results = {}
        elapsed = 0.0
        done = 0
        # compile BOTH chunk variants (fresh-init and carried opt_state) once
        warm = fit_simple(apply_fn, tx, jax.tree.map(jnp.copy, params), inputs, target, args.chunk, value_and_grad_fn=vag)
        warm = fit_simple(apply_fn, tx, warm.params, inputs, target,
                          args.chunk, value_and_grad_fn=vag,
                          opt_state=warm.opt_state)
        jax.device_get(warm.losses)
        # fit_simple donates its params: work on a copy so the caller's
        # pytree survives for reuse by another run_model
        p = jax.tree.map(jnp.copy, params)
        # carry opt_state across chunks: a fresh tx.init per chunk resets
        # Adam moments (and schedule counts), distorting time-to-PSNR
        ostate = None
        while done < args.max_steps:
            t0 = time.perf_counter()
            res = fit_simple(apply_fn, tx, p, inputs, target, args.chunk,
                             value_and_grad_fn=vag, opt_state=ostate)
            loss = float(jax.device_get(res.losses[-1]))
            elapsed += time.perf_counter() - t0
            p, ostate = res.params, res.opt_state
            done += args.chunk
            # NaN-diverged losses must not produce NaN/±Infinity in the
            # JSON line (neither is a valid JSON token downstream)
            if not np.isfinite(loss):
                psnr = None  # diverged: no target will be reached
            else:
                psnr = 10.0 * np.log10(data_range**2 / max(loss, 1e-30))
            for t in TARGETS:
                if t not in results and psnr is not None and psnr >= t:
                    results[t] = (elapsed, done)
        row = {
            "metric": f"time_to_psnr_{name}",
            "unit": "seconds",
            "targets": {
                str(t): {"seconds": round(v[0], 2), "steps": v[1]}
                for t, v in results.items()
            },
            # null marks a diverged (non-finite-loss) fit in valid JSON
            "final_psnr": None if psnr is None else round(psnr, 2),
            "steps": done,
        }
        print(json.dumps(row))
        return row

    key = jax.random.key(0)
    on_tpu = jax.devices()[0].platform == "tpu"

    # FF-SIREN (reference architecture) with the fused kernel
    B = fourier_matrix(key, 128, 4, 0.5)
    inputs = fourier_encode(coords, B)
    siren = Siren(hidden_features=512, hidden_layers=3)
    sp = siren.init(key, inputs[:8])
    apply_fn = make_fused_apply(siren) if on_tpu else siren.apply
    vag = make_fused_value_and_grad(siren) if on_tpu else None
    run_model("ff_siren", apply_fn, sp, optax.adam(1e-4), vag=vag)
    # restart_adam: periodic moment restarts — measured faster to every
    # PSNR target AND a higher final plateau than the reference flat Adam
    # (fit/optim.py rationale; results/round3_flagship/fast_fit.json)
    from mri_super_resolution_tpu.fit.optim import restart_adam
    run_model("ff_siren_restart100", apply_fn, sp, restart_adam(1e-4, 100),
              vag=vag)

    # GridINR on raw coords — both the per-point-gather path (honest round-1
    # negative result) and the separable tensor-product path (the TPU fix:
    # trilinear interp over an mgrid is three dense contractions, no gathers)
    from mri_super_resolution_tpu.models.grid_inr import make_tensor_apply

    inputs = coords
    grid = GridINR(num_levels=4, base_resolution=6, growth=2.0, hidden=64)
    gp = grid.init(key, coords[:8])
    run_model("grid_inr", grid.apply, gp, optax.adam(5e-3))
    run_model(
        "grid_inr_tensor", make_tensor_apply(grid, lr.shape), gp, optax.adam(5e-3)
    )
    # z_divisor=1: the 3-D pipeline's configuration (full z resolution per
    # level — the ROI LR grid's largest axis is z; see SupperresDWIConfig)
    grid_z1 = GridINR(num_levels=4, base_resolution=6, growth=2.0, hidden=64,
                      z_divisor=1)
    gp1 = grid_z1.init(key, coords[:8])
    run_model(
        "grid_inr_tensor_z1", make_tensor_apply(grid_z1, lr.shape), gp1,
        optax.adam(5e-3),
    )

    # WIRE on raw 4-D coords (the superres_dwi --inr_model wire arm) via the
    # fused Gabor kernel — the time-to-PSNR row for the model-family A/B
    from mri_super_resolution_tpu.models import Wire
    from mri_super_resolution_tpu.ops.pallas.wire_kernel import (
        make_wire_fused_apply,
        make_wire_value_and_grad,
    )

    wire = Wire(hidden_features=256, hidden_layers=2)
    wp = wire.init(key, coords[:8])
    run_model(
        "wire", make_wire_fused_apply(wire) if on_tpu else wire.apply, wp,
        optax.adam(5e-3),
        vag=make_wire_value_and_grad(wire) if on_tpu else None,
    )


if __name__ == "__main__":
    main()
