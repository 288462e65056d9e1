"""Architecture parity of models/rams.py against the TRAINED reference
network, proven from the reference's shipped TF checkpoint index files.

The reference restores RED_RAMS ckpt-91 at
multi-image-super-resolution/utils/training.py:98-102; its data shards are
missing (.MISSING_LARGE_BLOBS) but the .index files carry every variable's
dtype+shape. data/tfckpt.py parses them from scratch (no TF here); this test
asserts the multiset of weight shapes matches our flax param tree exactly.
"""
import collections
import os

import jax
import jax.numpy as jnp
import pytest

from mri_super_resolution_tpu.data.tfckpt import (
    model_variable_shapes, read_index)

CKPT_DIR = "/root/reference/multi-image-super-resolution/ckpt"
RED = os.path.join(CKPT_DIR, "RED_RAMS", "ckpt-91.index")

pytestmark = pytest.mark.skipif(
    not os.path.exists(RED), reason="reference checkpoints not present")


def _flax_shape_multiset():
    from mri_super_resolution_tpu.models.rams import RAMS

    model = RAMS(scale=3, filters=32, channels=9, r=8, N=12)
    x = jnp.zeros((1, 8, 8, 9), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x))["params"]
    shapes = [tuple(l.shape) for l in jax.tree.leaves(params)]
    return collections.Counter(shapes)


def _tf_shape_multiset(path):
    shapes = []
    for name, shape in model_variable_shapes(path).items():
        if name.endswith("/initialized"):  # tfa WN data-init flag, not a weight
            continue
        shapes.append(tuple(shape))
    return collections.Counter(shapes)


def test_index_reader_basics():
    idx = read_index(RED)
    # header-adjacent singletons the Trainer checkpoints (training.py:88-91)
    assert idx["step/.ATTRIBUTES/VARIABLE_VALUE"].dtype == "int32"
    assert idx["psnr/.ATTRIBUTES/VARIABLE_VALUE"].dtype == "float32"
    # first WN conv: v is (3,3,3,1,32) glorot kernel, g/bias are (32,)
    assert idx["model/layer_with_weights-0/v/.ATTRIBUTES/VARIABLE_VALUE"].shape \
        == (3, 3, 3, 1, 32)
    assert idx["model/layer_with_weights-0/g/.ATTRIBUTES/VARIABLE_VALUE"].shape \
        == (32,)


def test_rams_architecture_matches_trained_reference():
    """Every (v, g, bias) shape in ckpt-91 appears with the same multiplicity
    in our flax RAMS param tree — modulo nothing: the match must be exact."""
    tf_shapes = _tf_shape_multiset(RED)
    ours = _flax_shape_multiset()
    assert ours == tf_shapes, (
        f"missing from ours: {tf_shapes - ours}; extra in ours: {ours - tf_shapes}")


def test_all_red_checkpoints_agree():
    base = _tf_shape_multiset(RED)
    for n in (92, 93):
        other = os.path.join(CKPT_DIR, "RED_RAMS", f"ckpt-{n}.index")
        assert _tf_shape_multiset(other) == base


def test_reader_matches_tensorflow_if_available():
    """Cross-validate the from-scratch SSTable reader against TF's own
    list_variables (reads only the index, so missing data shards are fine)."""
    tf = pytest.importorskip("tensorflow")
    ours = {k: tuple(v.shape) for k, v in read_index(RED).items()}
    theirs = {k: tuple(v) for k, v in tf.train.list_variables(RED[:-6])}
    assert ours == theirs


def test_nir_rams_same_architecture():
    """NIR_RAMS (the other band's checkpoint) is the same architecture."""
    nir = os.path.join(CKPT_DIR, "NIR_RAMS", "ckpt-69.index")
    if not os.path.exists(nir):
        pytest.skip("NIR ckpt absent")
    assert _tf_shape_multiset(nir) == _tf_shape_multiset(RED)
