#!/usr/bin/env python
"""Flagship-kernel tile sweep (VERDICT r2 #5: close to >=90% of the matmul
floor). The remaining gap at tile=512 is VPU sincos + per-grid-step overhead;
a larger tile amortises the per-grid-step cost (fewer grid iterations over
the same rows) at the price of a larger VMEM working set.

Measures the full scanned fit (fit_simple, n_steps inside one jit) at the
flagship 3-D config for each tile, with convergence parity printed.

Usage: python scripts/flagship_tile_exp.py [--tiles 512 1024 2048]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, nargs="*", default=[512, 1024, 2048])
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--out", default="results/round3_flagship/tiles.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from mri_super_resolution_tpu.core.coords import (
        fourier_encode, fourier_matrix, mgrid)
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import Siren
    from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
        make_fused_value_and_grad, pad_rows_to)
    from mri_super_resolution_tpu.utils import time_jitted

    SHAPE = (25, 25, 28, 4)  # flagship LR ROI volume (superresDWI config)
    key = jax.random.key(0)
    B = fourier_matrix(key, 128, len(SHAPE), scale=0.5)
    coords = mgrid(SHAPE)
    ff = fourier_encode(coords, B)
    target = jax.random.uniform(key, (coords.shape[0], 1))
    model = Siren(hidden_features=512, hidden_layers=3)
    params = model.init(key, ff[:8])
    tx = optax.adam(1e-4)
    n_real = coords.shape[0]

    results = {}
    for tile in args.tiles:
        vag = make_fused_value_and_grad(model, n_rows=n_real, tile=tile)
        ffp, tp = pad_rows_to(ff, tile), pad_rows_to(target, tile)

        def run():
            res = fit_simple(
                model.apply, tx, jax.tree.map(jnp.copy, params), ffp, tp,
                args.steps, value_and_grad_fn=vag,
            )
            return res.losses

        try:
            sec = time_jitted(run, repeats=3, warmup=1)
        except Exception as e:
            print(f"tile {tile}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            results[str(tile)] = {"error": str(e)[:500]}
            continue
        ms = sec / args.steps * 1e3
        vps = n_real * args.steps / sec
        final_loss = float(jax.device_get(run())[-1])
        results[str(tile)] = {"ms_per_step": round(ms, 3),
                              "voxels_per_sec": round(vps, 1),
                              "final_loss": final_loss}
        print(f"tile {tile}: {ms:.3f} ms/step, {vps/1e6:.2f} M voxels/s, "
              f"final loss {final_loss:.3e}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
