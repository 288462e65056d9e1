"""Hybrid multi-b / multi-TE combination expansion, vectorised.

Reference equivalent: ``calculate_combinations`` (implicit-neural-
representations/SRDWI.py:143-152) fanned out over every voxel with a
32-process ``multiprocessing.Pool`` (superresDWI.py:57-77). Per voxel it takes
the Cartesian product of the acquisitions at each b-value (at a fixed TE) and
returns a ``(4, A1*A2*A3)`` pseudo-acquisition matrix.

The Cartesian product over independent per-axis choices is just a broadcasted
outer expansion: no per-voxel work exists at all. The whole volume expands in
one reshape/broadcast expression on device — this removes the reference's CPU
hot loop #3 entirely (SURVEY.md section 7, step 2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def expand_combinations(
    b0: Array, b1: Array, b2: Array, b3: Array
) -> Array:
    """Expand per-b acquisition stacks into all cross-b combinations.

    Parameters
    ----------
    b0 : (H, W, S) single b=0 volume (or (H, W, S, 1))
    b1, b2, b3 : (H, W, S, A_i) repeated acquisitions at each nonzero b

    Returns
    -------
    (H, W, S, 4, A1*A2*A3) array matching the reference's itertools.product
    ordering: index ``a`` enumerates (i, j, k) with k fastest
    (numpy-style row-major over (A1, A2, A3)).
    """
    if b0.ndim == 3:
        b0 = b0[..., None]
    H, W, S = b0.shape[:3]
    A1, A2, A3 = b1.shape[-1], b2.shape[-1], b3.shape[-1]
    n = A1 * A2 * A3

    row0 = b0.reshape(H, W, S, 1, 1, 1)
    row1 = b1[..., :, None, None]
    row2 = b2[..., None, :, None]
    row3 = b3[..., None, None, :]
    rows = [
        jnp.broadcast_to(r, (H, W, S, A1, A2, A3)).reshape(H, W, S, n)
        for r in (row0, row1, row2, row3)
    ]
    return jnp.stack(rows, axis=3)


def combination_mean(hybrid_raw_norm, te: int = 1) -> np.ndarray:
    """Mean over all cross-b combinations WITHOUT materializing the product.

    Every acquisition at a given b appears exactly ``prod(A_other)`` times in
    the Cartesian product, so the combination mean of each b-row is just that
    b's plain acquisition mean — O(sum A_i) host work instead of an
    O(prod A_i) ``(H, W, S, 4, N)`` intermediate (~700 MB at the flagship
    shapes, which the pipeline previously expanded on device and copied back
    only to mean-reduce). Matches ``expand_from_hybrid(...).mean(-1)`` up to
    f32 summation order (tested).
    """
    rows = []
    for b in range(4):
        a = np.asarray(hybrid_raw_norm[b][te], dtype=np.float32)
        rows.append(a.mean(-1) if a.ndim == 4 else a)
    return np.stack(rows, axis=3)


def expand_from_hybrid(hybrid_raw_norm, te: int = 1) -> Array:
    """Expansion from the nested ``hybrid_raw[b][te]`` layout at a fixed TE.

    The reference fixes TE index ... = 0 in calculate_combinations
    (SRDWI.py:145, commented as "TE=70ms closest to clinical DWI"). Pass the
    desired TE index explicitly.
    """
    b0 = jnp.asarray(hybrid_raw_norm[0][te])
    b1 = jnp.asarray(hybrid_raw_norm[1][te])
    b2 = jnp.asarray(hybrid_raw_norm[2][te])
    b3 = jnp.asarray(hybrid_raw_norm[3][te])
    return expand_combinations(b0, b1, b2, b3)
