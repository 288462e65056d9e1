"""tfevents writer validation: files must load in stock TensorBoard.

The writer (utils/tbevents.py) hand-rolls TFRecord framing (masked crc32c)
and the Event/Summary protobuf wire encoding; these tests decode the output
with tensorboard's own EventAccumulator — the same parser `tensorboard
--logdir` uses — so passing here means the files load in TensorBoard
(reference parity: utils/training.py:128-129,157-178).
"""
import math
import os

import numpy as np
import pytest

from mri_super_resolution_tpu.utils.tbevents import EventWriter, _crc32c

tb_event_accumulator = pytest.importorskip(
    "tensorboard.backend.event_processing.event_accumulator"
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32-Castagnoli
    assert _crc32c(b"") == 0x00000000
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_events_load_in_tensorboard(tmp_path):
    logdir = str(tmp_path / "run")
    steps = [1, 2, 5, 10]
    losses = [0.5, 0.25, 0.125, 0.0625]
    with EventWriter(logdir) as w:
        for s, l in zip(steps, losses):
            w.add_scalar("Loss", l, s)
            w.add_scalar("PSNR", 10.0 * s, s)

    acc = tb_event_accumulator.EventAccumulator(logdir)
    acc.Reload()
    assert set(acc.Tags()["scalars"]) == {"Loss", "PSNR"}
    loss_events = acc.Scalars("Loss")
    assert [e.step for e in loss_events] == steps
    np.testing.assert_allclose([e.value for e in loss_events], losses, rtol=1e-6)
    psnr_events = acc.Scalars("PSNR")
    np.testing.assert_allclose([e.value for e in psnr_events], [10.0 * s for s in steps])
    assert all(not math.isnan(e.wall_time) and e.wall_time > 0 for e in loss_events)


def test_trainer_writes_tb_scalars(tmp_path, rng):
    """End-to-end: Trainer with cfg.tensorboard emits loadable train/test runs."""
    import flax.linen as nn
    import jax.numpy as jnp

    from mri_super_resolution_tpu.config import TrainerConfig
    from mri_super_resolution_tpu.fit.trainer import Trainer

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            up = jnp.repeat(jnp.repeat(x[..., :1], 3, axis=1), 3, axis=2)
            return up * self.param("w", nn.initializers.ones, (1,))

    h = 8
    n = 4
    x = rng.uniform(size=(n, h, h, 2)).astype(np.float32)
    hr = rng.uniform(size=(n, 3 * h, 3 * h, 1)).astype(np.float32)
    mask = np.ones_like(hr)

    cfg = TrainerConfig(
        batch_size=2,
        epochs=2,
        evaluate_every=1,
        hr_size=3 * h,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        tensorboard=True,
    )
    tr = Trainer(Tiny(), cfg, name="tiny")
    tr.init(x)
    tr.fit(x, (hr, mask), validation_data=(x, hr, mask))

    for run, tags in (("train_tiny", {"Loss", "PSNR"}), ("test_tiny", {"Loss", "PSNR"})):
        acc = tb_event_accumulator.EventAccumulator(os.path.join(cfg.log_dir, run))
        acc.Reload()
        assert set(acc.Tags()["scalars"]) == tags, run
        assert len(acc.Scalars("Loss")) >= 2
