"""Trainer: stepping, determinism of structure, checkpoint round-trip,
multi-device data parallelism on the virtual CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.parallel.mesh import make_mesh
from frcnn_tpu.train.trainer import Trainer
from tests.test_objective import make_batch
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def trainer():
    cfg = tiny_config()
    return Trainer(cfg, mesh=make_mesh(n_devices=2))


def test_step_updates_params(trainer):
    batch = make_batch(trainer.cfg, np.random.default_rng(0))
    before = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.params)
    m1 = trainer.run_step(batch)
    assert np.isfinite(m1["loss"])
    after = trainer.params
    changed = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).sum()), after, before)
    )
    assert sum(1 for c in changed if c > 0) >= 0.9 * len(changed)
    assert trainer.step == 1
    assert len(trainer.stats.pcls) == 1


def test_more_steps_and_stats(trainer):
    for i in range(2):
        batch = make_batch(trainer.cfg, np.random.default_rng(10 + i))
        m = trainer.run_step(batch)
        assert np.isfinite(m["pcls"]) and np.isfinite(m["dreg"])
    assert len(trainer.stats.pcls) == trainer.step


def test_checkpoint_roundtrip(tmp_path, trainer):
    path = str(tmp_path / "snap_000003.ckpt")
    trainer.save_snapshot(path, options={"name": "tiny-test"})
    assert os.path.exists(path)

    cfg = trainer.cfg
    fresh = Trainer(cfg, mesh=make_mesh(n_devices=2), rng=jax.random.PRNGKey(99))
    # different init
    a = jax.tree.leaves(fresh.params)[0]
    b = jax.tree.leaves(trainer.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))

    fresh.restore_snapshot(path)
    for x, y in zip(jax.tree.leaves(fresh.params), jax.tree.leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # optimizer state restored (reference drops it; we keep it)
    for x, y in zip(jax.tree.leaves(fresh.opt_state), jax.tree.leaves(trainer.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert fresh.step == trainer.step
    assert fresh.stats.pcls == trainer.stats.pcls  # loss history resumes


def test_eight_device_mesh():
    """Full 8-virtual-device DP step (the dryrun_multichip path)."""
    import dataclasses

    cfg = tiny_config()
    cfg = cfg.replace(shapes=dataclasses.replace(cfg.shapes, images_per_step=8))
    tr = Trainer(cfg, mesh=make_mesh(n_devices=8))
    batch = make_batch(cfg, np.random.default_rng(5))
    m = tr.run_step(batch)
    assert np.isfinite(m["loss"])


@pytest.mark.parametrize("opti", ["sgd", "nag"])
def test_alternate_optimizers(opti):
    """The reference's commented-out alternatives (main.lua:122-124)."""
    cfg = tiny_config().replace(optimizer=opti)
    tr = Trainer(cfg, mesh=make_mesh(n_devices=2))
    batch = make_batch(cfg, np.random.default_rng(21))
    m = tr.run_step(batch)
    assert np.isfinite(m["loss"])


def test_constant_lr_schedule_mode():
    """lr_schedule='constant' (bug-compatible reference behavior)."""
    from frcnn_tpu.train.optim import lr_schedule

    cfg = tiny_config().replace(lr_schedule="constant", learning_rate=3e-4)
    s = lr_schedule(cfg)
    assert float(s(0)) == pytest.approx(3e-4)
    assert float(s(20000)) == pytest.approx(3e-4)
    cfg2 = tiny_config().replace(learning_rate=1e-4)
    s2 = lr_schedule(cfg2)
    assert float(s2(4999)) == pytest.approx(1e-4)
    assert float(s2(5000)) == pytest.approx(5e-5)
    assert float(s2(15000)) == pytest.approx(1.25e-5)


def test_prefetching_iterator():
    from frcnn_tpu.data.pipeline import PrefetchingIterator

    class Fake:
        def __init__(self):
            self.n = 0

        def next_training_batch(self):
            self.n += 1
            return self.n

    pf = PrefetchingIterator(Fake(), depth=2)
    got = [pf.next_training_batch() for _ in range(5)]
    assert got == [1, 2, 3, 4, 5]
    pf.close()


def test_run_chunk_matches_run_step_trajectory():
    """run_chunk(K batches) must produce the same parameter trajectory,
    rng stream, and per-step metrics as K run_step calls (the chunk
    program derives per-step keys in-program with the same split order).
    sgd keeps the comparison meaningful: under rmsprop the first-step
    update is ~lr*sign(g), which amplifies reassociation-level
    compilation differences (scan body vs straight-line) into visibly
    different trajectories."""
    cfg = tiny_config().replace(optimizer="sgd")
    rng = jax.random.PRNGKey(5)
    batches = [make_batch(cfg, np.random.default_rng(100 + i)) for i in range(3)]

    t1 = Trainer(cfg, mesh=make_mesh(n_devices=2), rng=rng)
    ms_step = [t1.run_step(b) for b in batches]

    t2 = Trainer(cfg, mesh=make_mesh(n_devices=2), rng=rng)
    ms_chunk = t2.run_chunk(batches)

    assert t2.step == t1.step == 3
    np.testing.assert_array_equal(
        np.asarray(t1.step_rng), np.asarray(t2.step_rng))
    for x, y in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(ms_step, ms_chunk):
        for key in ("loss", "pcls", "preg", "dcls", "dreg", "skipped"):
            np.testing.assert_allclose(a[key], b[key], rtol=1e-3, atol=1e-4)
    # singleton chunk falls back to run_step
    t2.run_chunk([make_batch(cfg, np.random.default_rng(200))])
    assert t2.step == 4
