"""INR fit engine: jitted, scanned training loops.

This replaces the reference's hand-written Python epoch loops with single
``jax.jit`` programs that ``lax.scan`` over steps — the whole 2500-3000-epoch
fit is one XLA executable with no host round-trips, and the ensemble-tail
prediction averaging lives in the scan carry instead of per-step GPU->CPU
copies (reference: master.py:137-160; superresDWI.py:132-156;
SURVEY.md section 7, step 4).

Provided loops:
- ``fit_simple``          — fixed-step MSE fit (superresDWI.py:132-145 phase 1).
- ``fit_ensemble``        — master.py:137-160: per-acquisition weighted-MSE
  steps with an ensemble tail accumulating dense-grid predictions over the
  last ``seg`` steps at 1x and scale x grids.
- ``fit_until``           — INR_ERD.py:201-217: train until loss < threshold
  with restart-on-collapse, as a ``lax.while_loop`` whose carry holds the PRNG
  key used for re-initialisation.
- ``fit_alternating_pn``  — superresDWI.py:146-156: last-10-epoch alternation
  of INR-on-mean steps (odd) and per-acquisition PerturbNet steps (even),
  including the double-Fourier-mapping quirk (the PN output, computed from
  already-encoded coords, is itself Fourier-encoded again before the INR;
  replicated deliberately — see SURVEY.md "hard parts").
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mri_super_resolution_tpu.core.coords import fourier_encode
from mri_super_resolution_tpu.fit.losses import mse, weighted_mse

Array = jax.Array
Params = Any


class FitResult(NamedTuple):
    params: Params
    opt_state: Any
    losses: Array  # per-step loss trace


# --------------------------------------------------------------------------
# simple fixed-step fit
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("apply_fn", "tx", "num_steps", "value_and_grad_fn"),
    donate_argnames=("params",),
)
def fit_simple(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    params: Params,
    coords: Array,
    target: Array,
    num_steps: int,
    value_and_grad_fn: Callable | None = None,
    opt_state=None,
) -> FitResult:
    """``num_steps`` full-batch Adam MSE steps on (coords -> target).

    ``value_and_grad_fn(params, coords, target) -> (loss, grads)`` overrides
    the default autodiff path — e.g. the one-pass fused Pallas gradient
    (ops/pallas/siren_kernel.make_fused_value_and_grad).

    ``opt_state`` continues from a previous call's ``FitResult.opt_state``
    instead of a fresh ``tx.init`` — REQUIRED when chunking one logical fit
    across calls: a fresh init resets Adam moments and, for scheduled
    optimizers, the step count, so every chunk would restart the schedule."""
    if opt_state is None:
        opt_state = tx.init(params)

    def step(carry, _):
        params, opt_state = carry

        def loss_fn(p):
            return mse(apply_fn(p, coords), target)

        if value_and_grad_fn is not None:
            loss, grads = value_and_grad_fn(params, coords, target)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), None, length=num_steps)
    return FitResult(params, opt_state, losses)


# --------------------------------------------------------------------------
# master.py ensemble fit
# --------------------------------------------------------------------------


class EnsembleResult(NamedTuple):
    params: Params
    losses: Array
    pred_1x: Array  # ensemble-mean prediction on the base grid
    pred_scale: Array  # ensemble-mean prediction on the scale-x grid


@functools.partial(
    jax.jit,
    static_argnames=("apply_fn", "tx", "total_steps", "seg",
                     "weighted_value_and_grad_fn"),
    donate_argnames=("params",),
)
def fit_ensemble(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    params: Params,
    coords: Array,  # (P, d) shared grid
    pixels: Array,  # (A, P, 1) per-acquisition targets
    weights: Array,  # (A, P, 1) acceptance weights
    eval_coords_1x: Array,  # (P, d)
    eval_coords_scale: Array,  # (P*s^2, d)
    total_steps: int,
    seg: int,
    valid: Array | None = None,  # (A,) mask for padded acquisition slots
    weighted_value_and_grad_fn: Callable | None = None,
) -> EnsembleResult:
    """The master.py:137-160 loop: each step does one Adam update per
    acquisition (weighted MSE); the last ``seg`` steps also evaluate the INR
    on the 1x and scale-x grids and accumulate the predictions (averaged on
    return).

    ``valid`` marks real acquisition slots: padded slots (vmapped directions
    with unequal counts) leave params AND optimizer state untouched, so
    Adam's bias-correction count matches the reference's per-direction loop
    exactly — a zero-weight update would still advance the count and decay
    the moments.

    ``weighted_value_and_grad_fn(params, coords, target, w) -> (loss, grads)``
    overrides autodiff for the per-acquisition update — the one-pass fused
    kernel (siren_kernel.make_fused_weighted_value_and_grad)."""
    opt_state = tx.init(params)
    if valid is None:
        valid = jnp.ones((pixels.shape[0],), bool)
    n_valid = jnp.maximum(valid.sum(), 1)

    def one_acq_update(carry, inputs):
        params, opt_state = carry
        target, w, ok = inputs

        def loss_fn(p):
            return weighted_mse(apply_fn(p, coords), target, w)

        if weighted_value_and_grad_fn is not None:
            loss, grads = weighted_value_and_grad_fn(params, coords, target, w)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state)
        new_params = optax.apply_updates(params, updates)
        keep = lambda old, new: jax.tree.map(
            lambda a, b: jnp.where(ok, b, a), old, new
        )
        return (keep(params, new_params), keep(opt_state, new_opt)), jnp.where(ok, loss, 0.0)

    def train_one_step(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(
            one_acq_update, (params, opt_state), (pixels, weights, valid)
        )
        return params, opt_state, losses.sum() / n_valid

    def head_step(carry, _):
        params, opt_state = carry
        params, opt_state, loss = train_one_step(params, opt_state)
        return (params, opt_state), loss

    (params, opt_state), head_losses = jax.lax.scan(
        head_step, (params, opt_state), None, length=total_steps - seg
    )

    def tail_step(carry, _):
        params, opt_state, acc1, acc2 = carry
        params, opt_state, loss = train_one_step(params, opt_state)
        acc1 = acc1 + apply_fn(params, eval_coords_1x)
        acc2 = acc2 + apply_fn(params, eval_coords_scale)
        return (params, opt_state, acc1, acc2), loss

    out_f = pixels.shape[-1]  # accumulator width = model output features
    acc1 = jnp.zeros((eval_coords_1x.shape[0], out_f))
    acc2 = jnp.zeros((eval_coords_scale.shape[0], out_f))
    (params, opt_state, acc1, acc2), tail_losses = jax.lax.scan(
        tail_step, (params, opt_state, acc1, acc2), None, length=seg
    )
    return EnsembleResult(
        params,
        jnp.concatenate([head_losses, tail_losses]),
        acc1 / seg,
        acc2 / seg,
    )


# --------------------------------------------------------------------------
# INR_ERD threshold fit with restart-on-collapse
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def plain_apply_init(model, ndim: int = 2):
    """Identity-stable ``(apply_fn, init_fn)`` pair for perturb-style models
    (``model.apply(p, coords, sample, eps)``) with the perturbation off.

    ``fit_until`` hashes its static ``apply_fn``/``init_fn`` by object
    identity: a fresh ``def init_fn`` closure or ``functools.partial`` per
    call makes EVERY case/slice recompile the heaviest while_loop program in
    the repo. This builder returns the same pair per (model, ndim), so a
    cohort sweep compiles once. (flax Modules are frozen dataclasses —
    hashable cache keys.)"""

    def apply_fn(params, coords):
        return model.apply(params, coords, sample=0.0, eps=0.0)

    def init_fn(key):
        return model.init(key, jnp.zeros((1, ndim)), 0.0, 0.0)

    return apply_fn, init_fn


@functools.partial(
    jax.jit,
    static_argnames=("apply_fn", "tx", "init_fn", "loss_threshold", "max_steps",
                     "value_grad_absmax_fn"),
)
def fit_until(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    init_fn: Callable[[jax.Array], Params],
    key: jax.Array,
    coords: Array,
    target: Array,
    loss_threshold: float = 2e-5,
    max_steps: int = 200_000,
    value_grad_absmax_fn: Callable | None = None,
):
    """Train until loss < threshold; re-initialise model+optimizer whenever the
    output collapses to all-zero (INR_ERD.py:201-217), bounded by max_steps.

    ``value_grad_absmax_fn(params, coords, target) -> (loss, out_absmax,
    grads)`` overrides autodiff with the one-pass fused kernel that also
    reports the collapse signal (siren_kernel.make_fused_value_grad_absmax) —
    ~5x faster per step than the XLA path at the INR_ERD configuration.

    Returns (params, steps_taken, final_loss).
    """
    key, sub = jax.random.split(key)
    params0 = init_fn(sub)

    def cond(carry):
        _, _, _, loss, it = carry
        return jnp.logical_and(loss > loss_threshold, it < max_steps)

    def body(carry):
        params, opt_state, key, _, it = carry

        def loss_fn(p):
            out = apply_fn(p, coords)
            return mse(out, target), out

        if value_grad_absmax_fn is not None:
            loss, out_absmax, grads = value_grad_absmax_fn(params, coords, target)
        else:
            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            out_absmax = jnp.max(jnp.abs(out))
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)

        collapsed = out_absmax == 0.0
        key, sub = jax.random.split(key)

        def restart(_):
            p = init_fn(sub)
            return p, tx.init(p)

        params, opt_state = jax.lax.cond(
            collapsed, restart, lambda _: (params, opt_state), None
        )
        return params, opt_state, key, loss, it + 1

    init = (params0, tx.init(params0), key, jnp.asarray(jnp.inf), jnp.asarray(0))
    params, _, _, loss, it = jax.lax.while_loop(cond, body, init)
    return params, it, loss


# --------------------------------------------------------------------------
# superresDWI two-phase + alternating PerturbNet fit
# --------------------------------------------------------------------------


class AlternatingResult(NamedTuple):
    inr_params: Params
    pn_params: Params
    losses: Array
    inr_opt_state: object = None
    pn_opt_state: object = None


@functools.partial(
    jax.jit,
    static_argnames=(
        "inr_apply",
        "pn_apply",
        "inr_tx",
        "pn_tx",
        "num_epochs",
        "pn_epochs",
        "inr_value_and_grad",
        "pn_encode",
        "phase2_start",
    ),
    donate_argnames=("inr_params", "pn_params"),
)
def fit_alternating_pn(
    inr_apply: Callable,
    pn_apply: Callable,
    inr_tx: optax.GradientTransformation,
    pn_tx: optax.GradientTransformation,
    inr_params: Params,
    pn_params: Params,
    ff_coords: Array,  # (P, 2m) Fourier-encoded LR grid
    mean_target: Array,  # (P, 1) LR mean image
    acq_pixels: Array,  # (A, P, 1) per-acquisition targets
    B: Array,  # Fourier matrix, for the double-mapping of PN output
    num_epochs: int = 2500,
    pn_epochs: int = 10,
    pn_eps: float = 1.0 / 128.0,
    inr_value_and_grad: Callable | None = None,
    padded_ff: Array | None = None,
    padded_target: Array | None = None,
    inr_opt_state=None,
    pn_opt_state=None,
    pn_encode: Callable | None = None,
    phase2_start: int | None = None,
) -> AlternatingResult:
    """superresDWI.py:132-156: ``num_epochs - pn_epochs`` INR-on-mean steps,
    then ``pn_epochs`` alternating steps — odd: INR-on-mean; even: one
    PN-only Adam update per acquisition.

    Quirk preserved: the PN consumes the *encoded* coords and its d-dim output
    is Fourier-encoded again before the INR (SRDWI.py:149-151) — so the INR
    sees gamma(PN(gamma(x))) rather than gamma(x + PN(...)).

    ``inr_value_and_grad(params, coords, target) -> (loss, grads)`` overrides
    autodiff for the INR-on-mean steps (the 2490-epoch hot loop) — the
    one-pass fused kernel path. ``padded_ff``/``padded_target`` are
    tile-aligned copies consumed ONLY by those steps (pair with a vag built
    with ``n_rows=P``): pre-padding outside the scan saves ~155 us/step on
    the flagship volume (XLA does not hoist the loop-invariant pad itself).
    The PN branch keeps ``inr_apply`` and the unpadded arrays (its gradient
    flows through the INR's input).

    ``inr_opt_state``/``pn_opt_state`` continue from a previous call's
    ``AlternatingResult`` states — required when chunking one logical
    schedule across calls (same contract as ``fit_simple``'s opt_state).

    ``pn_encode`` maps the PN output to the INR's input space; the default
    re-applies the Fourier mapping with ``B`` (the reference's double-mapping
    quirk). Models that consume raw coordinates (GridINR) pass identity.

    ``phase2_start`` overrides the absolute epoch index of the first
    alternating step (default ``num_epochs - pn_epochs``). Callers that run
    the mean-fit phase in a SEPARATE program (the z-bucketed grid path) call
    this with ``num_epochs == pn_epochs`` plus the true offset so the
    odd/even parity of the alternation matches the reference's absolute
    epoch numbering (superresDWI.py:146-156).
    """
    inr_opt = inr_tx.init(inr_params) if inr_opt_state is None else inr_opt_state
    pn_opt = pn_tx.init(pn_params) if pn_opt_state is None else pn_opt_state
    vag_ff = ff_coords if padded_ff is None else padded_ff
    vag_target = mean_target if padded_target is None else padded_target

    def inr_step(inr_params, inr_opt):
        def loss_fn(p):
            return mse(inr_apply(p, ff_coords), mean_target)

        if inr_value_and_grad is not None:
            loss, grads = inr_value_and_grad(inr_params, vag_ff, vag_target)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(inr_params)
        updates, inr_opt = inr_tx.update(grads, inr_opt)
        return optax.apply_updates(inr_params, updates), inr_opt, loss

    def phase1(carry, _):
        inr_params, inr_opt = carry
        inr_params, inr_opt, loss = inr_step(inr_params, inr_opt)
        return (inr_params, inr_opt), loss

    (inr_params, inr_opt), p1_losses = jax.lax.scan(
        phase1, (inr_params, inr_opt), None, length=num_epochs - pn_epochs
    )

    acq_ids = jnp.arange(acq_pixels.shape[0], dtype=jnp.float32)

    # The even branch needs the *current* INR params without updating them;
    # lax.cond passes them through the operand tuple.
    def phase2_step(carry, epoch):
        inr_params, inr_opt, pn_params, pn_opt = carry
        is_odd = (epoch % 2) == 1

        def odd_branch(operand):
            inr_params, inr_opt, pn_params, pn_opt = operand
            inr_params2, inr_opt2, loss = inr_step(inr_params, inr_opt)
            return inr_params2, inr_opt2, pn_params, pn_opt, loss

        def even_branch(operand):
            inr_params, inr_opt, pn_params, pn_opt = operand

            def pn_update(carry, inputs):
                pn_params, pn_opt = carry
                sample_idx, target = inputs

                def loss_fn(p):
                    perturbed = pn_apply(p, ff_coords, sample_idx, pn_eps)
                    re_encoded = (fourier_encode(perturbed, B)
                                  if pn_encode is None else pn_encode(perturbed))
                    return mse(inr_apply(inr_params, re_encoded), target)

                loss, grads = jax.value_and_grad(loss_fn)(pn_params)
                updates, pn_opt = pn_tx.update(grads, pn_opt)
                return (optax.apply_updates(pn_params, updates), pn_opt), loss

            (pn_params, pn_opt), losses = jax.lax.scan(
                pn_update, (pn_params, pn_opt), (acq_ids, acq_pixels)
            )
            return inr_params, inr_opt, pn_params, pn_opt, losses.mean()

        inr_params, inr_opt, pn_params, pn_opt, loss = jax.lax.cond(
            is_odd, odd_branch, even_branch, (inr_params, inr_opt, pn_params, pn_opt)
        )
        return (inr_params, inr_opt, pn_params, pn_opt), loss

    start = num_epochs - pn_epochs if phase2_start is None else phase2_start
    epochs = jnp.arange(start, start + pn_epochs)
    (inr_params, inr_opt, pn_params, pn_opt), p2_losses = jax.lax.scan(
        phase2_step, (inr_params, inr_opt, pn_params, pn_opt), epochs
    )
    return AlternatingResult(
        inr_params, pn_params, jnp.concatenate([p1_losses, p2_losses]),
        inr_opt, pn_opt,
    )


# --------------------------------------------------------------------------
# chunked dense-grid inference
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=256)
def _grid_runner(apply_fn: Callable, use_fourier: bool, clamp_min):
    """Identity-stable jitted grid evaluator.

    params (and the Fourier matrix) are TRACED arguments, not closed-over
    constants, so re-running with new params — the per-TE loop of
    hybrid.fit_all_te, the per-patient loop of superres3d.run — reuses one
    executable instead of recompiling (minutes apiece on tunnelled-compile
    environments). Keyed on the apply callable: pass a stable one
    (``model.apply`` — flax bound methods hash by (module, function) — or a
    module-level function), not a fresh lambda/partial."""
    from mri_super_resolution_tpu.core.coords import fourier_encode

    @jax.jit
    def run(params, B, c):
        x = fourier_encode(c, B) if use_fourier else c
        out = apply_fn(params, x)
        return jnp.clip(out, clamp_min, None) if clamp_min is not None else out

    return run


def infer_grid(
    apply_fn: Callable,
    params: Params,
    coords: Array,
    encode: Callable[[Array], Array] | None = None,
    chunk: int = 262_144,
    clamp_min: float | None = None,
    fourier_B: Array | None = None,
) -> Array:
    """Evaluate the INR on a dense grid in memory-bounded chunks.

    Dense upsample grids (2x/4x volumes, the 100^3 coronal grid of
    superresDWI.py:217-221) explode once Fourier-encoded; chunking keeps the
    peak footprint flat. Returns (P, out_features).

    Pass the Fourier matrix via ``fourier_B`` (traced; one executable per
    (model, chunk) across calls) rather than a fresh ``encode`` closure,
    which forces a fresh jit + recompile per call.
    """
    P = coords.shape[0]

    if encode is not None:
        # legacy path: arbitrary encode closure -> per-call jit
        @jax.jit
        def run_legacy(c):
            out = apply_fn(params, encode(c))
            return (jnp.clip(out, clamp_min, None)
                    if clamp_min is not None else out)

        run = lambda c: run_legacy(c)
    else:
        use_fourier = fourier_B is not None
        B = fourier_B if use_fourier else jnp.zeros((0,))
        cached = _grid_runner(apply_fn, use_fourier, clamp_min)
        run = lambda c: cached(params, B, c)

    if P <= chunk:
        return run(coords)
    # Pad the ragged last chunk to the full chunk size so every slice hits
    # the SAME executable — a second compile per (shape, model) costs minutes
    # on tunnelled-compile environments; P % chunk wasted rows cost ~nothing.
    if P % chunk:
        pad = chunk - P % chunk
        coords = jnp.concatenate([coords, coords[:pad]], axis=0)
    outs = [run(coords[i : i + chunk]) for i in range(0, coords.shape[0], chunk)]
    return jnp.concatenate(outs, axis=0)[:P]


@functools.lru_cache(maxsize=256)
def _grid_gen_runner(
    apply_fn: Callable, use_fourier: bool, clamp_min, d: int, chunk: int
):
    """Jitted evaluator that GENERATES its coordinate chunk on device.

    Axis sizes ride as a traced i32 vector and the chunk's starting row as a
    traced scalar, so ONE executable serves every dense grid of rank ``d`` —
    any volume shape, any chunk offset. This is what makes
    :func:`infer_dense_grid` volume-shape-independent: nothing about the
    grid is baked into the compiled program, and no (P, d) coordinate array
    is ever materialised in HBM or shipped over PCIe/tunnel.

    As with :func:`_grid_runner`, the lru_cache keys on ``apply_fn``'s
    identity — callers must pass a stable callable (a bound ``model.apply``
    or an lru-cached adapter), never a fresh lambda/partial, or every call
    pays a silent recompile and the cache grows permanently.
    """
    from mri_super_resolution_tpu.core.coords import fourier_encode

    @jax.jit
    def run(params, B, sizes, start):
        i = start + jnp.arange(chunk, dtype=jnp.int32)
        # row-major unravel with traced sizes: stride_a = prod(sizes[a+1:])
        rev_cp = jnp.cumprod(sizes[::-1])
        strides = jnp.concatenate(
            [rev_cp[::-1][1:], jnp.ones((1,), sizes.dtype)]
        )
        idx = (i[:, None] // strides[None, :]) % sizes[None, :]
        # linspace(-1, 1, n)[j] = -1 + 2j/(n-1); n == 1 -> [-1.] (guard)
        denom = jnp.maximum(sizes - 1, 1).astype(jnp.float32)
        c = -1.0 + 2.0 * idx.astype(jnp.float32) / denom
        x = fourier_encode(c, B) if use_fourier else c
        out = apply_fn(params, x)
        return jnp.clip(out, clamp_min, None) if clamp_min is not None else out

    return run


def infer_dense_grid(
    apply_fn: Callable,
    params: Params,
    grid_shape: Sequence[int],
    chunk: int = 262_144,
    clamp_min: float | None = None,
    fourier_B: Array | None = None,
) -> np.ndarray:
    """Evaluate the INR on the dense ``mgrid(grid_shape)`` without building it.

    Volume-shape-independent alternative to ``infer_grid(.., mgrid(shape))``:
    the coordinate chunk is generated inside one rank-keyed jitted program
    (:func:`_grid_gen_runner`), so a cohort with heterogeneous slice counts
    reuses a single executable instead of paying per-shape compiles for the
    grid construction, the pad/concatenate ops, and every chunk slice —
    measured ~10 s per novel shape on tunnelled-compile environments, and
    ~50 s cold (results/round3_e2e). Matches ``mgrid`` + :func:`infer_grid`
    to f32 rounding (parity-tested). Returns a host ``(P, out)`` array.

    Pass a STABLE ``apply_fn`` (a bound ``model.apply``, not a fresh
    lambda/partial) — the compiled-program cache keys on the callable's
    identity, so a fresh closure per call silently recompiles every time
    and grows the cache without bound (same convention as
    :func:`_grid_runner`).

    The in-program index math is int32 (TPU-native); grids with >= 2^31
    voxels would silently wrap, so they are rejected up front.
    """
    sizes_np = np.asarray(grid_shape, dtype=np.int32)
    P = int(np.prod(np.asarray(grid_shape, dtype=np.int64)))
    if P >= 2**31:
        raise ValueError(
            f"infer_dense_grid: grid {tuple(grid_shape)} has {P} voxels, "
            "which overflows the int32 on-device index math; evaluate in "
            "sub-volumes instead"
        )
    use_fourier = fourier_B is not None
    B = fourier_B if use_fourier else jnp.zeros((0,))
    # grids smaller than the chunk run a power-of-two bucket instead of the
    # full chunk (bounded executable count, no 262k-row program for a toy
    # grid); grids at/above the chunk all share the one chunk-sized program
    chunk = min(int(chunk), 1 << (P - 1).bit_length())
    run = _grid_gen_runner(
        apply_fn, use_fourier, clamp_min, len(grid_shape), int(chunk)
    )
    sizes = jnp.asarray(sizes_np)
    outs = [
        np.asarray(run(params, B, sizes, jnp.int32(start)))
        for start in range(0, P, chunk)
    ]
    return np.concatenate(outs, axis=0)[:P]
