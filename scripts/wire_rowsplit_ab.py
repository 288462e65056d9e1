#!/usr/bin/env python
"""WIRE Gabor-kernel row_split A/B (VERDICT r3 weak #4 follow-up).

Round 3 ran the row_split interleave experiment on the SIREN kernel only
(negative: Mosaic did not interleave the chains and sub-tiles cost MXU
efficiency — results/round3_flagship/split_ab.json). The Gabor step is
VPU-transcendental-bound (exp + 2x sincos per hidden layer), so independent
sub-block chains have more latency to hide; this script runs the same A/B
on wire_loss_grads at row_split {1, 2, 4} over two production shapes:

  - bench shape:     2 -> 256x2 Gabor, 16,384 coords (wiretest.ipynb config)
  - pipeline shape:  4 -> 256x2 Gabor, 100,800 coords (superres_dwi
                     --inr_model wire, the hybrid/3-D LR volume size)

Timing protocol: fit_simple's scanned+jitted program (one dispatch for all
steps), timed with utils.time_jitted (device_get fencing, median of 3).
Writes results/round4_wire/rowsplit_ab.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from mri_super_resolution_tpu.core.coords import mgrid
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import Wire
    from mri_super_resolution_tpu.ops.pallas.wire_kernel import (
        make_wire_value_and_grad,
    )
    from mri_super_resolution_tpu.utils import time_jitted

    steps = 500
    shapes = {
        "bench_2d_16k": mgrid((128, 128)),
        "pipeline_4d_100k": jax.random.uniform(
            jax.random.key(7), (100800, 4), minval=-1.0, maxval=1.0
        ),
    }
    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0]), "steps": steps, "cases": {}}

    for name, coords in shapes.items():
        key = jax.random.key(0)
        target = jax.random.uniform(key, (coords.shape[0], 1))
        model = Wire(hidden_features=256, hidden_layers=2)
        params = model.init(key, coords)
        tx = optax.adam(5e-3)
        rows = {}
        for rs in (1, 2, 4):
            vag = make_wire_value_and_grad(model, row_split=rs)

            def run():
                return fit_simple(
                    model.apply, tx, jax.tree.map(jnp.copy, params),
                    coords, target, steps, value_and_grad_fn=vag,
                ).losses

            sec = time_jitted(run)  # median of 3, device_get-fenced
            rows[f"row_split={rs}"] = {
                "wall_s": round(sec, 4),
                "ms_per_step": round(sec * 1e3 / steps, 4),
                "voxel_steps_per_sec": round(coords.shape[0] * steps / sec, 1),
            }
            print(json.dumps({"case": name, "row_split": rs} | rows[f"row_split={rs}"]),
                  flush=True)
        out["cases"][name] = rows

    os.makedirs("results/round4_wire", exist_ok=True)
    with open("results/round4_wire/rowsplit_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/round4_wire/rowsplit_ab.json")


if __name__ == "__main__":
    main()
