#!/usr/bin/env python
"""Probe: does the v5e MXU run int8 dots ~2x the bf16 rate under Pallas?

Gate experiment for the VERDICT r3 #10 lever (int8 stash for the flagship
backward): the dW matmuls consume a bf16 activation stash whose values are
already in [-1, 1] (sine outputs / coords), so an int8 stash with a fixed
scale is exact to ~0.8% relative — worth kernel surgery ONLY if the int8
MXU path actually delivers on this backend through Mosaic.

Times a grid of repeated (T, 512) x (512, 512) dots — the flagship dW
shape class — at dtype {bf16, int8} with f32/int32 accumulation, plus a
dequant epilogue for the int8 case (the real kernel must rescale).
Writes results/round4_flagship/int8_probe.json.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # the dW accumulation pattern: VMEM-resident stash blocks, 8 static-slice
    # dots per grid step into a revisited (H, H) accumulator, GRID sequential
    # steps to amortize the ~1 ms tunnel dispatch out of the measurement
    T, H, REPS, GRID = 384, 512, 8, 512

    def make_kernel(acc):
        def kernel(a_ref, b_ref, o_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

            b = b_ref[:]
            acc_v = jnp.zeros((T, H), acc)
            for r in range(REPS):
                a = a_ref[r * T:(r + 1) * T, :]
                acc_v = acc_v + jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc)
            o_ref[:] += acc_v.astype(jnp.float32)
        return kernel

    def build(a, b, acc):
        return jax.jit(pl.pallas_call(
            make_kernel(acc),
            out_shape=jax.ShapeDtypeStruct((T, H), jnp.float32),
            grid=(GRID,),
            in_specs=[pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ))

    rng = np.random.default_rng(0)
    out = {"platform": jax.devices()[0].platform, "device": str(jax.devices()[0]),
           "tile": [T, H], "reps": REPS, "grid": GRID, "cases": {}}
    flops = 2.0 * T * H * H * REPS * GRID

    for name, dtype, acc in (("bf16_f32acc", jnp.bfloat16, jnp.float32),
                             ("int8_i32acc", jnp.int8, jnp.int32)):
        if dtype == jnp.int8:
            a = jnp.asarray(rng.integers(-127, 127, (REPS * T, H)), jnp.int8)
            b = jnp.asarray(rng.integers(-127, 127, (H, H)), jnp.int8)
        else:
            a = jnp.asarray(rng.uniform(-1, 1, (REPS * T, H)), jnp.bfloat16)
            b = jnp.asarray(rng.uniform(-1, 1, (H, H)), jnp.bfloat16)
        try:
            run = build(a, b, acc)
            jax.device_get(run(a, b))  # compile
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                r = run(a, b)
            jax.device_get(r)
            dt = (time.perf_counter() - t0) / n
            out["cases"][name] = {
                "us_per_call": round(dt * 1e6, 2),
                "achieved_tops": round(flops / dt / 1e12, 2),
            }
        except Exception as e:  # Mosaic may reject int8 dots outright
            out["cases"][name] = {"error": f"{type(e).__name__}: {e}"[:500]}
        print(json.dumps({name: out["cases"][name]}), flush=True)

    os.makedirs("results/round4_flagship", exist_ok=True)
    with open("results/round4_flagship/int8_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/round4_flagship/int8_probe.json")


if __name__ == "__main__":
    main()
