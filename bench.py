#!/usr/bin/env python
"""Headline benchmark: 3-D volume INR fit throughput (voxels/sec/chip).

Workload = the reference's flagship 3-D fit (superresDWI.py:102-156):
Fourier-feature SIREN (128 mappings -> 256 input dims, 512x3 hidden) trained
full-batch on the LR ROI volume grid (25 x 25 x S x 4 coords per step, Adam).

Prints ONE JSON line:
    {"metric": "inr_fit_voxels_per_sec_per_chip", "value": ..., "unit":
     "voxels/sec/chip", "vs_baseline": ...}

``vs_baseline`` divides our throughput by the reference PyTorch
implementation's, measured on this host's CPU with identical shapes (the
reference's CUDA GPU is unavailable here; see BASELINE.md for the protocol
and caveats). Pass --no-torch to reuse the last stored baseline number.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

S_SLICES = 28  # slices in the anon volumes
SHAPE = (25, 25, S_SLICES, 4)  # LR ROI voxel grid (superresDWI.py:92-100)
MAPPING = 128
HIDDEN = 512
LAYERS = 3


def measure_jax(steps: int, use_pallas: bool = True) -> float:
    """Flagship: FF-SIREN 512x3 full-batch fit via the one-pass fused kernel."""
    import jax
    import jax.numpy as jnp
    import optax

    from mri_super_resolution_tpu.core.coords import fourier_matrix, fourier_encode, mgrid
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import Siren
    from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
        make_fused_value_and_grad, pad_rows_to)
    from mri_super_resolution_tpu.utils import time_jitted

    key = jax.random.key(0)
    B = fourier_matrix(key, MAPPING, len(SHAPE), scale=0.5)
    coords = mgrid(SHAPE)
    ff = fourier_encode(coords, B)  # encode once outside the loop, like the ref
    target = jax.random.uniform(key, (coords.shape[0], 1))
    model = Siren(hidden_features=HIDDEN, hidden_layers=LAYERS)
    params = model.init(key, ff[:8])
    tx = optax.adam(1e-4)

    # one-pass fused Pallas train-step gradient on TPU; XLA autodiff on CPU.
    # Pre-pad coords/target to the kernel tile ONCE (XLA won't hoist the
    # loop-invariant pad out of the scan body; ~155 us/step saved).
    on_tpu = jax.devices()[0].platform == "tpu"
    n_real = coords.shape[0]
    if use_pallas and on_tpu:
        vag = make_fused_value_and_grad(model, n_rows=n_real)
        ff, target = pad_rows_to(ff, 512), pad_rows_to(target, 512)
    else:
        vag = None

    def run():
        res = fit_simple(
            model.apply, tx, jax.tree.map(jnp.copy, params), ff, target, steps,
            value_and_grad_fn=vag,
        )
        return res.losses

    sec = time_jitted(run, repeats=3, warmup=1)
    voxels = coords.shape[0] * steps
    return voxels / sec


def measure_erd(steps: int) -> float:
    """SirenERD trunk (INR_ERD.py config: 2 -> 128x3 + ReLU head) full-slice
    fit throughput via the one-pass fused kernel (128x128 coords/step)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mri_super_resolution_tpu.core.coords import mgrid
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import SirenERD
    from mri_super_resolution_tpu.ops.pallas.siren_kernel import make_fused_value_and_grad
    from mri_super_resolution_tpu.utils import time_jitted

    coords = mgrid((128, 128))
    key = jax.random.key(0)
    target = jax.random.uniform(key, (coords.shape[0], 1))
    model = SirenERD(hidden_features=128, hidden_layers=3, perturb=True)
    params = model.init(key, coords, 0.0, 0.0)
    tx = optax.adam(3e-4)
    on_tpu = jax.devices()[0].platform == "tpu"
    vag = make_fused_value_and_grad(model) if on_tpu else None
    apply_plain = lambda p, c: model.apply(p, c, sample=0.0, eps=0.0)

    def run():
        res = fit_simple(
            apply_plain, tx, jax.tree.map(jnp.copy, params), coords, target, steps,
            value_and_grad_fn=vag,
        )
        return res.losses

    sec = time_jitted(run, repeats=3, warmup=1)
    return coords.shape[0] * steps / sec


def measure_wire(steps: int) -> float:
    """WIRE (wiretest.ipynb config: 2 -> 256x2 Gabor) full-slice fit
    throughput via the fused paired-real kernel."""
    import jax
    import jax.numpy as jnp
    import optax

    from mri_super_resolution_tpu.core.coords import mgrid
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import Wire
    from mri_super_resolution_tpu.ops.pallas.wire_kernel import make_wire_value_and_grad
    from mri_super_resolution_tpu.utils import time_jitted

    coords = mgrid((128, 128))
    key = jax.random.key(0)
    target = jax.random.uniform(key, (coords.shape[0], 1))
    model = Wire(hidden_features=256, hidden_layers=2)
    params = model.init(key, coords)
    tx = optax.adam(5e-3)
    on_tpu = jax.devices()[0].platform == "tpu"
    vag = make_wire_value_and_grad(model) if on_tpu else None

    def run():
        res = fit_simple(
            model.apply, tx, jax.tree.map(jnp.copy, params), coords, target, steps,
            value_and_grad_fn=vag,
        )
        return res.losses

    sec = time_jitted(run, repeats=3, warmup=1)
    return coords.shape[0] * steps / sec


def measure_pia(n_voxels: int = 65536, steps: int = 20) -> float:
    """PIA amortized tissue-parameter inference (encode) throughput.

    The capability PIA.py:16-155 exists for: replacing the per-voxel
    curve_fit loop. Recovery-accuracy evidence is
    results/round3_pia/recovery_rangetrain.json. Protocol (round 4,
    scripts/pia_roofline.py): ``steps`` encodes chained in ONE program with
    a loop-carried input — a single timed call on the tunnelled backend is
    dominated by the ~45 ms dispatch + fetching the (n, 3) maps at
    ~12 MB/s, not by compute (and a carry that merely consumes the outputs
    lets XLA hoist the loop-invariant encode). Encode throughput is
    weight-independent, so fresh-init params time the trained program."""
    import jax
    import jax.numpy as jnp

    from mri_super_resolution_tpu.models.pia import PIA, synthetic_batch
    from mri_super_resolution_tpu.utils import time_jitted

    model = PIA()
    sig, *_ = synthetic_batch(jax.random.key(1), n_voxels, 0.05)
    params = model.init(jax.random.key(0), sig[:8])
    sig = jax.device_put(sig)

    @jax.jit
    def enc_scan(x):
        def body(c, _):
            D, T2, v = model.apply(params, x + c * 1e-9, method=model.encode)
            return (D.sum() + T2.sum() + v.sum()) * 1e-9, None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return out

    sec = time_jitted(lambda: enc_scan(sig), repeats=3, warmup=1)
    return n_voxels * steps / sec


def measure_pia_train(n_voxels: int = 16384, steps: int = 30) -> dict:
    """PIA TRAINING step throughput (encoder + analytic decode +
    PIDS-weighted loss + Adam — pipelines/pia_train.py's inner jit;
    reference loop PIA.py:171-213). Same dispatch-amortized protocol as
    measure_pia: ``steps`` optimizer steps scanned in ONE program.
    Roofline context: fwd+bwd matmul FLOPs ~ 3x the encode FLOPs/voxel
    (scripts/pia_roofline.py's analytic count), against the 197 TF/s bf16
    MXU ceiling the encode measurement validated."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import optax

    from mri_super_resolution_tpu.models.pia import (
        PIA, pia_loss_unsupervised, synthetic_batch)

    model = PIA()
    sig, *_ = synthetic_batch(jax.random.key(2), n_voxels, 0.05)
    params = model.init(jax.random.key(0), sig[:8])
    tx = optax.adam(1e-4)
    opt = tx.init(params)
    pids = jnp.ones_like(sig)
    sig = jax.device_put(sig)

    @jax.jit
    def train_steps(params, opt):
        def body(carry, _):
            p, o = carry

            def loss_fn(q):
                pred, *_ = model.apply(q, sig)
                return pia_loss_unsupervised(pred, sig, pids)

            loss, g = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(g, o)
            return (optax.apply_updates(p, up), o), loss

        (p, o), ls = jax.lax.scan(body, (params, opt), None, length=steps)
        return p, o, ls

    p, o, ls = train_steps(params, opt)
    jax.device_get(ls)
    t0 = _time.perf_counter()
    p, o, ls = train_steps(p, o)
    jax.device_get(ls)
    per_step = (_time.perf_counter() - t0) / steps

    # analytic encode MACs*2 per voxel (pia_roofline.encoder_flops_per_voxel)
    dims = [model.number_of_signals] + list(model.hidden_dims)
    macs = sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    H = model.hidden_dims[-1]
    macs += 3 * (model.predictor_depth * H * H + H * 3)
    fwd_flops = 2.0 * macs
    tf = 3.0 * fwd_flops * n_voxels / per_step / 1e12
    return {
        "value": round(n_voxels / per_step, 1),
        "ms_per_step": round(per_step * 1e3, 3),
        "approx_tflops_fwd_bwd": round(tf, 2),
        "approx_pct_bf16_mxu_peak": round(100 * tf / 197.0, 1),
    }


def measure_grid(steps: int) -> float:
    """GridINR (multires dense-grid INR, this framework's model-zoo addition)
    full-volume fit throughput on the flagship LR ROI shape, via the
    separable tensor-product path (scatter-free, all-MXU; models/grid_inr.py).
    Quality-side evidence (time-to-PSNR vs FF-SIREN) lives in
    bench_quality.py; this line tracks raw fit throughput."""
    import jax
    import jax.numpy as jnp
    import optax

    from mri_super_resolution_tpu.core.coords import mgrid
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import GridINR
    from mri_super_resolution_tpu.models.grid_inr import make_tensor_apply
    from mri_super_resolution_tpu.utils import time_jitted

    key = jax.random.key(0)
    coords = mgrid(SHAPE)
    target = jax.random.uniform(key, (coords.shape[0], 1))
    # z_divisor=1 matches SupperresDWIConfig's pipeline setting (full z
    # resolution per level — required on ROI grids where z is the largest
    # axis), so this line times the same model the e2e evidence used
    model = GridINR(num_levels=4, base_resolution=6, growth=2.0, hidden=64,
                    z_divisor=1)
    params = model.init(key, coords[:8])
    tx = optax.adam(5e-3)
    apply = make_tensor_apply(model, SHAPE)

    def run():
        res = fit_simple(
            apply, tx, jax.tree.map(jnp.copy, params), coords, target, steps,
        )
        return res.losses

    sec = time_jitted(run, repeats=3, warmup=1)
    return coords.shape[0] * steps / sec


def measure_rams(steps: int, batch: int = 8) -> float:
    """MISR trainer step throughput (patches/sec): RAMS at the reference
    config (multi-image-super-resolution/master.py:20-27 — scale 3, F=32,
    T=9, N=12), ``batch`` 32x32 LR stacks -> 96x96 HR, shift-tolerant L1.
    batch=8 is the reference operating point; batch=96 is the measured
    throughput optimum on the v5e (results/round4_rams/batch_sweep_hi.json)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.fit.trainer import Trainer
    from mri_super_resolution_tpu.pipelines.misr import build_rams

    cfg = TrainerConfig(batch_size=batch, hr_size=96,
                        checkpoint_dir="/tmp/bench_rams_ckpt",
                        log_dir="/tmp/bench_rams_logs")
    tr = Trainer(build_rams(RAMSConfig()), cfg, name="bench")
    rng = np.random.default_rng(0)
    B = batch
    x = jnp.asarray(rng.uniform(7000, 8000, (B, 32, 32, 9)).astype(np.float32))
    y = jnp.asarray(rng.uniform(7000, 8000, (B, 96, 96, 1)).astype(np.float32))
    m = jnp.ones_like(y)
    w = jnp.ones((B,), jnp.float32)  # full batch: unit sample weights
    st = tr.init(x)
    p, o = st.params, st.opt_state
    for _ in range(3):
        p, o, loss, _ = tr._train_step(p, o, x, y, m, w)
    jax.device_get(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        p, o, loss, _ = tr._train_step(p, o, x, y, m, w)
    jax.device_get(loss)
    return B * steps / (time.perf_counter() - t0)


def measure_rams_inference(batch: int = 25, side: int = 128) -> float:
    """MISR inference: the reference's 25-draw ensemble
    (multi-image-super-resolution/master.py:45-52) as ONE batched call —
    seconds per case (25 draws of a full 128x128x9 stack -> 384x384)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_super_resolution_tpu.config import RAMSConfig
    from mri_super_resolution_tpu.pipelines.misr import build_rams
    from mri_super_resolution_tpu.utils import time_jitted

    model = build_rams(RAMSConfig())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(7000, 8000, (batch, side, side, 9)).astype(np.float32))
    params = model.init(jax.random.key(0), x[:1])
    fwd = jax.jit(lambda v: model.apply(params, v))
    return time_jitted(lambda: fwd(x), repeats=3, warmup=1)


def measure_serving(quick: bool = False) -> list:
    """Serving-artifact latency lines (serve.py): export + load + batched
    eval for the three artifact kinds — the INR volume artifact
    (superres_dwi --export_artifact form), the RAMS 25-draw case, and the
    PIA tissue fitter. Eval latency is the steady-state jitted call on
    device; export/load are one-off host costs."""
    import tempfile
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_super_resolution_tpu import serve
    from mri_super_resolution_tpu.config import RAMSConfig
    from mri_super_resolution_tpu.core.coords import fourier_encode, fourier_matrix
    from mri_super_resolution_tpu.models import Siren
    from mri_super_resolution_tpu.models.pia import PIA
    from mri_super_resolution_tpu.pipelines.misr import build_rams
    from mri_super_resolution_tpu.utils import time_jitted

    rows = []
    tmp = tempfile.mkdtemp(prefix="bench_serve_")
    key = jax.random.key(0)
    rng = np.random.default_rng(0)

    def bench_one(name, export, make_batch, batch_desc):
        d = os.path.join(tmp, name)
        t0 = _time.perf_counter()
        export(d)
        export_s = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        served = serve.load(d)
        load_s = _time.perf_counter() - t0
        x = make_batch()
        xs = x if isinstance(x, tuple) else (x,)
        sec = time_jitted(lambda: served(*xs), repeats=3, warmup=1)
        rows.append({
            "metric": f"serving_{name}_eval_ms",
            "value": round(sec * 1e3, 2),
            "unit": "ms",
            "batch": batch_desc,
            "export_s": round(export_s, 2),
            "load_s": round(load_s, 3),
        })

    # INR: flagship artifact form (raw 4-D coords -> intensity, FF baked in)
    inr = Siren(hidden_features=512, hidden_layers=3)
    B = fourier_matrix(key, 128, 4, scale=0.5)
    inr_params = inr.init(key, fourier_encode(jnp.zeros((8, 4)), B))
    n = 65536 if quick else 262144
    coords = jnp.asarray(rng.uniform(-1, 1, (n, 4)).astype(np.float32))
    bench_one(
        "inr",
        lambda d: serve.export_inr(inr.apply, inr_params, 4, d, fourier_B=B),
        lambda: coords,
        f"{n} coords",
    )

    # GridINR: the quality preset's model serving the 2x recon grid of the
    # flagship ROI (separable tensor-product artifact, all axes symbolic)
    from mri_super_resolution_tpu.models import GridINR

    grid = GridINR(z_divisor=1)
    grid_params = grid.init(jax.random.key(3), jnp.zeros((1, 4)))
    gx = 48 if quick else 100
    gz = 8 if quick else 28
    gaxes = tuple(jnp.linspace(-1.0, 1.0, nn) for nn in (gx, gx, gz))
    bench_one(
        "grid",
        lambda d: serve.export_grid_inr(grid, grid_params, d),
        lambda: gaxes,
        f"{gx}x{gx}x{gz}x4 recon grid",
    )

    # RAMS: the 25-draw case ensemble as one batch
    side = 32 if quick else 128
    draws = 4 if quick else 25
    rams = build_rams(RAMSConfig())
    xr = jnp.asarray(rng.uniform(7000, 8000, (draws, side, side, 9)).astype(np.float32))
    rams_params = rams.init(jax.random.key(1), xr[:1])
    bench_one(
        "rams",
        lambda d: serve.export_rams(rams.apply, rams_params, d,
                                    height=side, width=side),
        lambda: xr,
        f"{draws}x{side}x{side}x9",
    )

    # PIA: one hybrid slice of signal vectors (superresHybrid operating point)
    pia = PIA()
    sig = jnp.asarray(rng.uniform(0, 1000, (14400, 16)).astype(np.float32))
    pia_params = pia.init(jax.random.key(2), sig[:8])
    bench_one(
        "pia",
        lambda d: serve.export_pia(
            lambda p, x: pia.apply(p, x, method=pia.encode), pia_params, d),
        lambda: sig,
        "14400 signals (one 120x120 slice)",
    )
    return rows


def measure_torch(steps: int) -> float:
    """Reference PyTorch workload (superresDWI.py:105-145 semantics) on CPU.

    Pinned protocol (BASELINE.json measured_baselines): single torch thread
    (1-core host), 2 warmup steps, identical shapes to measure_jax."""
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(1)
    P = 1
    for s in SHAPE:
        P *= s
    x = torch.rand(P, 2 * MAPPING)
    y = torch.rand(P, 1)

    layers = []
    in_dim = 2 * MAPPING

    class Sine(torch.nn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.lin = torch.nn.Linear(i, o)

        def forward(self, t):
            return torch.sin(30.0 * self.lin(t))

    net = torch.nn.Sequential(
        Sine(in_dim, HIDDEN),
        *[Sine(HIDDEN, HIDDEN) for _ in range(LAYERS)],
        torch.nn.Linear(HIDDEN, 1),
    )
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)
    # warmup
    for _ in range(2):
        loss = ((net(x) - y) ** 2).mean()
        opt.zero_grad(); loss.backward(); opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = ((net(x) - y) ** 2).mean()
        opt.zero_grad(); loss.backward(); opt.step()
    sec = time.perf_counter() - t0
    return P * steps / sec


def _probe_backend(timeout: float = 300.0) -> str | None:
    """Device discovery in a SUBPROCESS with a timeout.

    A wedged TPU tunnel makes jax.devices() hang indefinitely in-process
    (observed: >9 min with no error), which would leave the driver's bench
    run with no JSON line at all. Probing in a child process bounds the
    damage; on timeout/failure the caller pins this process to CPU so a
    well-formed (clearly marked) line is still produced."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True, timeout=timeout, text=True,
        )
        if r.returncode == 0:
            return r.stdout.strip().splitlines()[-1]
    except (subprocess.TimeoutExpired, OSError):
        pass
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer steps for smoke runs")
    ap.add_argument("--no-torch", action="store_true", help="reuse cached torch baseline")
    ap.add_argument("--all", action="store_true",
                    help="also print erd/wire model-family lines before the headline")
    ap.add_argument("--probe_timeout", type=float, default=300.0)
    args = ap.parse_args()

    platform = _probe_backend(args.probe_timeout)
    fallback = platform is None
    if fallback:
        import jax

        jax.config.update("jax_platforms", "cpu")
        platform = "cpu-fallback (accelerator discovery hung)"
        print(json.dumps({"warning": "device discovery timed out; "
                          "benchmarking on CPU fallback"}), file=sys.stderr)
        # the full workload is ~10 s/step on host CPU (4 warmup+timed calls
        # of a steps-long scan); shrink so a marked line still lands fast
        args.quick = True

    # Step counts follow the reference workloads (3-D fit: 2500 epochs,
    # superresDWI.py:84-90; 2-D fits: 3000 steps, master.py:28): long enough
    # that the ~45 ms fixed per-dispatch cost of the device tunnel is
    # amortised the way it is in a real run, short enough to finish fast.
    steps = 30 if args.quick else 500
    small_steps = 30 if args.quick else 1000
    torch_steps = 3 if args.quick else 10
    if fallback:
        steps, small_steps, torch_steps = 5, 5, 2  # ~10 s/step on host CPU

    if args.all:
        for name, fn in (("erd", measure_erd), ("wire", measure_wire),
                         ("grid_inr", measure_grid)):
            print(
                json.dumps(
                    {
                        "metric": f"{name}_fit_voxels_per_sec_per_chip",
                        "value": round(fn(small_steps), 1),
                        "unit": "voxels/sec/chip",
                    }
                )
            )
        print(
            json.dumps(
                {
                    "metric": "pia_inference_voxels_per_sec_per_chip",
                    "value": round(measure_pia(
                        4096 if args.quick else 65536), 1),
                    "unit": "voxels/sec/chip",
                }
            )
        )
        print(
            json.dumps(
                {
                    "metric": "pia_train_voxels_per_sec_per_chip",
                    "unit": "voxels/sec/chip",
                    **measure_pia_train(
                        4096 if args.quick else 16384,
                        10 if args.quick else 30),
                }
            )
        )
        sec_case = measure_rams_inference(4 if args.quick else 25,
                                          32 if args.quick else 128)
        print(
            json.dumps(
                {
                    "metric": "rams_infer_25draw_s_per_case",
                    "value": round(sec_case, 3),
                    "unit": "s/case",
                    "note": "one batched call of the reference's 25-draw "
                            "ensemble (master.py:45-52), full 128x128 slice",
                }
            )
        )
        for row in measure_serving(args.quick):
            print(json.dumps(row))
        # roofline context (VERDICT r2 #1): analytic conv FLOPs at the
        # reference config ~48 G per patch; the architecture's filters=32
        # caps MXU lane occupancy at 25%, so the achievable ceiling is
        # ~49 TF/s bf16 (see scripts/profile_rams.py). Two operating
        # points: the reference batch (8) and the measured v5e throughput
        # optimum (96; results/round4_rams/batch_sweep_hi.json).
        flops_per_patch = 48.0e9
        rams_points = [(8, "rams_train_patches_per_sec_per_chip")]
        if not args.quick:
            # the B=96 step is ~12x the B=8 FLOPs — skip it in quick/smoke
            # mode (incl. the CPU-fallback path, which sets quick=True)
            rams_points.append((96, "rams_train_b96_patches_per_sec_per_chip"))
        for rb, metric in rams_points:
            rams_pps = measure_rams(10 if args.quick else 50, batch=rb)
            rams_tf = flops_per_patch * rams_pps / 1e12
            print(
                json.dumps(
                    {
                        "metric": metric,
                        "value": round(rams_pps, 1),
                        "unit": "patches/sec/chip",
                        "batch": rb,
                        "ms_per_step": round(rb * 1e3 / rams_pps, 2),
                        "achieved_tflops": round(rams_tf, 2),
                        "pct_lane_constrained_roofline": round(100 * rams_tf / 49.25, 1),
                    }
                )
            )

    ours = measure_jax(steps)

    # baseline resolution: --no-torch -> the committed BASELINE.json number
    # (pinned protocol, reproducible); otherwise re-measure with the same
    # pinned protocol and report which source was used.
    committed = None
    baseline_json = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")
    if os.path.exists(baseline_json):
        committed = (
            json.load(open(baseline_json))
            .get("measured_baselines", {})
            .get("torch_cpu_inr_fit_voxels_per_sec")
        )
    if args.no_torch and committed is not None:
        baseline, source = committed, "BASELINE.json"
    else:
        baseline, source = measure_torch(torch_steps), "measured"

    print(
        json.dumps(
            {
                "metric": "inr_fit_voxels_per_sec_per_chip",
                "value": round(ours, 1),
                "unit": "voxels/sec/chip",
                "vs_baseline": round(ours / baseline, 2),
                "baseline_voxels_per_sec": round(baseline, 1),
                "baseline_source": source,
                "platform": platform,
            }
        )
    )


if __name__ == "__main__":
    main()
