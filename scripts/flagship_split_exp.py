"""Measure the row_split kernel option (and its cross with a shorter cos
polynomial) on the real chip. See flagship_trig_exp.py for the trig-degree
half of the experiment.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from mri_super_resolution_tpu.ops.pallas import siren_kernel as sk
from scripts.flagship_trig_exp import make_sincos, _COS4


def run_fit(row_split, steps=600, tile=512):
    from mri_super_resolution_tpu.core.coords import (
        fourier_matrix, fourier_encode, mgrid)
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import Siren

    key = jax.random.key(0)
    coords = mgrid((25, 25, 28, 4))
    B = fourier_matrix(key, 128, 4, scale=0.5)
    ff = fourier_encode(coords, B)
    target = jax.random.uniform(key, (coords.shape[0], 1))
    model = Siren(hidden_features=512, hidden_layers=3)
    params = model.init(key, ff[:8])
    n_real = coords.shape[0]
    vag = sk.make_fused_value_and_grad(model, tile=tile, n_rows=n_real,
                                       row_split=row_split)
    ffp, tp = sk.pad_rows_to(ff, tile), sk.pad_rows_to(target, tile)

    def run():
        res = fit_simple(model.apply, optax.adam(1e-4),
                         jax.tree.map(jnp.copy, params), ffp, tp, steps,
                         value_and_grad_fn=vag)
        return res.losses

    losses = jax.device_get(run())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run())
        best = min(best, (time.perf_counter() - t0) / steps)
    return best, float(losses[-1]), n_real


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--out", default="results/round3_flagship/split_ab.json")
    args = ap.parse_args()

    out = {}
    for name, (split, short_cos, tile) in {
        "base": (1, False, 512),
        "split2": (2, False, 512),
        "split4": (4, False, 512),
        "split2_shortcos": (2, True, 512),
        "split2_tile1024": (2, False, 1024),
    }.items():
        sk._fast_sincos = (make_sincos(sk._SIN_C, _COS4) if short_cos
                           else make_sincos(sk._SIN_C, sk._COS_C))
        sk.make_fused_value_and_grad.cache_clear()
        jax.clear_caches()
        try:
            sec, loss, n = run_fit(split, args.steps, tile)
        except Exception as e:  # noqa: BLE001 - record compile failures
            out[name] = {"error": str(e)[:300]}
            print(name, "FAILED:", str(e)[:120], flush=True)
            continue
        out[name] = {"ms_per_step": round(sec * 1e3, 4),
                     "voxels_per_sec": round(n / sec, 1),
                     "final_loss": loss}
        print(name, out[name], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
