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
