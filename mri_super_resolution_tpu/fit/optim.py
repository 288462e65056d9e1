"""Identity-stable optimizer constructors for jitted fit loops.

The fit-engine entry points (fit_simple / fit_ensemble / fit_until /
fit_alternating_pn) take the optax transformation as a jax.jit STATIC
argument, so jit's in-process executable cache is keyed on the tx object's
identity. ``optax.adam(lr)`` returns a fresh NamedTuple of fresh closures
every call — two calls never compare equal — so a pipeline that constructs
its optimizer inside a per-case loop silently retraces AND reloads the
compiled executable for every case. On this environment's tunnelled TPU
backend an executable load is seconds-to-minutes, which turned the 11-case
2-D cohort from one compile + 11 fast fits into 11 compiles (measured: the
warm rerun of cli/master.py was slower than the cold one).

These wrappers memoise by hyperparameter value, so every case sees the SAME
transformation object and jit reuses the in-memory executable. The same
reasoning applies to the fused-kernel vag builders (closures over the model)
— those are memoised at their definition site (ops/pallas/siren_kernel).
"""
from __future__ import annotations

import functools

import optax


@functools.lru_cache(maxsize=None)
def cached_adam(learning_rate: float) -> optax.GradientTransformation:
    """optax.adam with an identity stable across calls with equal lr."""
    return optax.adam(learning_rate)


@functools.lru_cache(maxsize=None)
def restart_adam(learning_rate: float, every: int) -> optax.GradientTransformation:
    """Adam with periodic moment restarts (identity-stable).

    Every ``every`` steps the inner Adam state — first/second moments AND
    bias-correction count — is reset to zero. On full-batch INR fits the
    reset briefly re-inflates the effective step (fresh bias correction) and
    discards stale second-moment scales, which measures as faster
    time-to-PSNR than flat Adam on the flagship 3-D fit: 40 dB in 600 vs
    1100 steps at lr=1e-4/every=100 (results/round3_flagship/
    time_to_psnr.jsonl; discovered via the round-1 bench protocol, whose
    per-chunk ``tx.init`` was resetting state every 100 steps by accident
    and outperforming the continuous fit). Single-run FINAL PSNR on these
    near-interpolating fits is Adam-chaotic (>10 dB spread between identical
    reruns), so the plateau advantage (71 vs 50 dB in the recorded runs) is
    indicative, not a calibrated claim; steps-to-target is the stable
    statistic (multi-seed protocol in scripts/fast_fit_exp.py).

    The reset happens inside ``update`` via a counter carried in the state,
    so the schedule works unchanged inside ``lax.scan`` fit loops.

    ``every <= 0`` means "no restarts" (the config convention for the
    disabled flag) and returns plain cached Adam rather than tracing
    ``step % 0``.
    """
    if every <= 0:
        return cached_adam(learning_rate)
    inner = optax.adam(learning_rate)

    def init(params):
        import jax.numpy as jnp

        return (inner.init(params), jnp.zeros([], jnp.int32))

    def update(grads, state, params=None):
        import jax
        import jax.numpy as jnp

        inner_state, step = state
        do = jnp.logical_and(step > 0, step % every == 0)
        inner_state = jax.tree.map(
            lambda x: jnp.where(do, jnp.zeros_like(x), x), inner_state
        )
        updates, inner_state = inner.update(grads, inner_state, params)
        return updates, (inner_state, step + 1)

    return optax.GradientTransformation(init, update)
