"""ERD (erroneous-repetition detection): outlier acquisition rejection.

Reference equivalents:
- ``auto_erd`` — master.py:76-93: per-pixel sklearn
  ``AgglomerativeClustering(n_clusters=2, linkage='complete')`` over the
  acquisition intensity vector, then either
  * mode 1 (majority vote): if one cluster holds >= 2/3 of acquisitions,
    reject the other cluster's acquisitions;
  * mode 2 (intensity-cognisant): where the reference ERD map is positive,
    reject the higher-mean cluster.
  The reference fits 60x60 sklearn models in a Python double loop (CPU hot
  loop #1). Here the clustering is computed exactly, in parallel for every
  pixel: for 1-D data under complete linkage, clusters are contiguous
  intervals in sorted order, so agglomeration reduces to repeatedly removing
  the cheapest sorted-order boundary (cost = interval max - interval min).
- ``soft_erd_mean`` / ``soft_erd_weights`` — INR_ERD.py:126-160 and
  :222-236: softmax-temperature weighting with
  ``T = max(mul * exp(-slope * mean(x)/b0), 2)`` applied only where
  ``mean(x) > 2 * noise_level``. Pure elementwise ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _complete_linkage_split(values: Array) -> Array:
    """Exact 2-cluster complete-linkage labels for a 1-D vector.

    Returns int labels (0 = lower cluster, 1 = upper cluster) in the input's
    original order. Complete-linkage agglomeration on 1-D data keeps clusters
    as contiguous sorted intervals; merging adjacent intervals L, R costs
    ``max(R) - min(L)``. We start from singletons and perform A-2 cheapest
    merges, tracked as a boundary-activity mask over the A-1 sorted gaps.
    """
    A = values.shape[0]
    order = jnp.argsort(values)
    v = values[order]

    nb = A - 1  # candidate boundaries between sorted positions k and k+1
    idx = jnp.arange(nb)

    def merge_once(active, _):
        # prev_active[k]: largest active boundary j < k (else -1)
        # next_active[k]: smallest active boundary j > k (else A-1 sentinel)
        mask_lt = idx[None, :] < idx[:, None]  # j < k
        prev = jnp.max(
            jnp.where(mask_lt & active[None, :], idx[None, :], -1), axis=1
        )
        mask_gt = idx[None, :] > idx[:, None]
        nxt = jnp.min(
            jnp.where(mask_gt & active[None, :], idx[None, :], nb), axis=1
        )
        # merging across boundary k joins [prev+1 .. k] with [k+1 .. nxt]
        cost = v[nxt] - v[prev + 1]
        cost = jnp.where(active, cost, jnp.inf)
        k = jnp.argmin(cost)
        return active.at[k].set(False), None

    active0 = jnp.ones((nb,), dtype=bool)
    active, _ = jax.lax.scan(merge_once, active0, None, length=A - 2)
    # exactly one boundary remains: positions above it form the upper cluster
    split = jnp.argmax(active)
    labels_sorted = (jnp.arange(A) > split).astype(jnp.int32)
    labels = jnp.zeros((A,), jnp.int32).at[order].set(labels_sorted)
    return labels


def _ward_split(values: Array) -> Array:
    """Exact 2-cluster agglomerative-ward labels for a 1-D vector.

    Unlike complete linkage, ward merges in 1-D are NOT guaranteed to keep
    clusters contiguous in sorted order (a large middle cluster can make a
    skip-merge cheaper through the size factor), so this runs the full
    agglomeration: A-2 merges, each picking the pair minimising the
    Lance-Williams ward cost ``n_i n_j / (n_i + n_j) * (m_i - m_j)^2`` —
    sklearn ``AgglomerativeClustering(linkage='ward')`` parity
    (superres.ipynb cell 10). Returns labels (0 = lower-mean cluster).
    """
    A = values.shape[0]
    ids = jnp.arange(A)
    ones = jnp.ones((A,), values.dtype)

    def merge_once(labels, _):
        counts = jax.ops.segment_sum(ones, labels, num_segments=A)
        sums = jax.ops.segment_sum(values, labels, num_segments=A)
        means = sums / jnp.maximum(counts, 1.0)
        alive = counts > 0
        cost = (
            counts[:, None]
            * counts[None, :]
            / jnp.maximum(counts[:, None] + counts[None, :], 1.0)
            * (means[:, None] - means[None, :]) ** 2
        )
        valid = alive[:, None] & alive[None, :] & (ids[:, None] < ids[None, :])
        cost = jnp.where(valid, cost, jnp.inf)
        k = jnp.argmin(cost)
        i, j = k // A, k % A
        return jnp.where(labels == j, i, labels), None

    labels, _ = jax.lax.scan(merge_once, ids, None, length=A - 2)
    counts = jax.ops.segment_sum(ones, labels, num_segments=A)
    sums = jax.ops.segment_sum(values, labels, num_segments=A)
    means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), -jnp.inf)
    upper_id = jnp.argmax(means)
    return (labels == upper_id).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mode", "linkage"))
def auto_erd(
    img: Array,  # (H, W, A) acquisition stack for one slice
    erd_map: Array | None = None,  # (H, W) reference ERD (mode 2)
    mode: int = 1,
    linkage: str = "complete",
) -> Array:
    """Per-pixel acceptance mask (H, W, A), 1 = keep.

    mode 1: reject the minority cluster when the majority holds >= 2/3 of A.
    mode 2: where ``erd_map > 0``, reject the LOWER-mean cluster
            (master.py:88-93: when ``sample_means[k] > sample_means[1-k]``
            the reference zeroes acceptance for ``labels == 1-k`` — motion
            dropout makes outliers dark, so the dimmer cluster goes; note
            SURVEY.md's one-line summary of this rule is inverted).
    mode 3: keep only the strictly larger cluster; on equal sizes keep all
            (the superres.ipynb cell-10 rule, used there with ward linkage).
    linkage: 'complete' (master.py:78) or 'ward' (superres.ipynb cell 10).
    """
    A = img.shape[-1]
    flat = img.reshape(-1, A)
    if linkage == "complete":
        split = _complete_linkage_split
    elif linkage == "ward":
        split = _ward_split
    else:
        raise ValueError(f"linkage must be 'complete' or 'ward', got {linkage!r}")
    labels = jax.vmap(split)(flat)  # (P, A)

    len1 = labels.sum(axis=1, keepdims=True)  # cluster-1 sizes
    len0 = A - len1
    sum1 = jnp.sum(jnp.where(labels == 1, flat, 0.0), axis=1, keepdims=True)
    sum0 = jnp.sum(jnp.where(labels == 0, flat, 0.0), axis=1, keepdims=True)
    mean1 = sum1 / jnp.maximum(len1, 1)
    mean0 = sum0 / jnp.maximum(len0, 1)

    if mode == 1:
        # reject cluster c where the other cluster's size >= 2/3 A
        thresh = (2.0 / 3.0) * A
        reject1 = (len0 >= thresh) & (labels == 1)
        reject0 = (len1 >= thresh) & (labels == 0)
        accept = ~(reject0 | reject1)
    elif mode == 2:
        if erd_map is None:
            raise ValueError("mode 2 requires erd_map")
        gate = (erd_map.reshape(-1, 1) > 0)
        higher_is_1 = mean1 > mean0
        # reject the lower-mean cluster (the one the reference zeroes)
        reject = jnp.where(higher_is_1, labels == 0, labels == 1)
        accept = ~(gate & reject)
    elif mode == 3:
        keep1 = (len1 > len0) & (labels == 1)
        keep0 = (len0 > len1) & (labels == 0)
        tie = len0 == len1
        accept = keep0 | keep1 | tie
    else:
        raise ValueError(f"mode must be 1, 2 or 3, got {mode}")
    return accept.astype(jnp.int32).reshape(img.shape)


def _soft_temperature(x_mean: Array, b0: Array, mul: float, slope: float) -> Array:
    return jnp.maximum(mul * jnp.exp(-slope * (x_mean / b0)), 2.0)


@jax.jit
def soft_erd_mean(
    acq: Array,  # (H, W, A) acquisitions of one slice
    b0: Array,  # (H, W)
    noise_level: Array,  # scalar
    mul: float = 1000.0,
    slope: float = 20.0,
) -> Array:
    """Softmax-temperature weighted mean image (``calc_adc_erd_single2``,
    INR_ERD.py:126-160). Below 2x noise the plain mean is used."""
    x_mean = acq.mean(axis=-1)
    temp = _soft_temperature(x_mean, b0, mul, slope)
    w = jax.nn.softmax(acq / temp[..., None], axis=-1)
    soft = jnp.sum(w * acq, axis=-1)
    return jnp.where(x_mean > 2.0 * noise_level, soft, x_mean)


@jax.jit
def soft_erd_weights(
    acq: Array,
    b0: Array,
    noise_level: Array,
    mul: float = 1000.0,
    slope: float = 20.0,
) -> Array:
    """Per-acquisition loss weights (INR_ERD.py:222-236): raw ``exp(x/T)``
    where signal exceeds 2x noise, else uniform ``1/A``. Note the training
    weights are deliberately *unnormalised* exp (matching the reference),
    unlike the softmax used for the mean image.

    Overflow guard (documented deviation): where ``exp(x/T)`` would overflow
    float32 (x/T > ~88, possible on raw scanner intensities with the
    temperature floored at 2) the pixel falls back to a one-hot on the
    largest acquisition. The reference WROTE this fallback
    (``except RuntimeWarning: w = onehot(x)``, INR_ERD.py:229-232) but under
    default numpy settings exp overflow only warns — the handler is dead
    code and the reference actually produces inf weights (-> inf loss, NaN
    grads). We implement the fallback the reference intended rather than
    the inf it ships."""
    A = acq.shape[-1]
    x_mean = acq.mean(axis=-1)
    temp = _soft_temperature(x_mean, b0, mul, slope)
    z = acq / temp[..., None]
    overflow = z.max(axis=-1, keepdims=True) > 80.0
    # strict one-hot via argmax (== against the max marks EVERY tied
    # maximum — quantized intensities tie routinely, and the reference's
    # onehot(x) uses np.argmax, which picks exactly one)
    onehot = jax.nn.one_hot(jnp.argmax(z, axis=-1), A, dtype=acq.dtype)
    w = jnp.where(overflow, onehot, jnp.exp(jnp.minimum(z, 80.0)))
    uniform = jnp.full_like(acq, 1.0 / A)
    return jnp.where((x_mean > 2.0 * noise_level)[..., None], w, uniform)
