"""Training driver: jitted data-parallel train step, stats, snapshots.

Replaces ``graph_training`` (``main.lua:103-153``): 50,000 optimizer steps,
per-step four-loss stats, loss plot every ``plot`` steps, snapshot every
``snapshot`` steps, restore resumes the loss history (``main.lua:94-98,
115-117``). Improvements over the reference, deliberate:

* optimizer state IS checkpointed (the reference drops RMSprop moving
  averages on restore — SURVEY.md §5),
* the lr schedule actually applies (see train/optim.py docstring),
* the step is one compiled XLA program, data-parallel over the mesh.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from frcnn_tpu.config import Config
from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.models.factory import create_models, init_params
from frcnn_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from frcnn_tpu.train.objective import TrainBatch, build_objective
from frcnn_tpu.train.optim import make_optimizer


@dataclass
class TrainingStats:
    """The four loss series of the reference (``objective.lua:211-214``)."""

    pcls: List[float] = field(default_factory=list)
    preg: List[float] = field(default_factory=list)
    dcls: List[float] = field(default_factory=list)
    dreg: List[float] = field(default_factory=list)

    def append(self, metrics: Dict[str, float]):
        self.pcls.append(float(metrics["pcls"]))
        self.preg.append(float(metrics["preg"]))
        self.dcls.append(float(metrics["dcls"]))
        self.dreg.append(float(metrics["dreg"]))

    def to_dict(self):
        return {"pcls": self.pcls, "preg": self.preg,
                "dcls": self.dcls, "dreg": self.dreg}

    @staticmethod
    def from_dict(d):
        return TrainingStats(
            pcls=list(d.get("pcls", [])), preg=list(d.get("preg", [])),
            dcls=list(d.get("dcls", [])), dreg=list(d.get("dreg", [])),
        )


class Trainer:
    def __init__(self, cfg: Config, mesh=None, rng: Optional[jax.Array] = None,
                 metrics_path: Optional[str] = None):
        from frcnn_tpu.utils.metrics import MetricsLogger, StepTimer

        self.cfg = cfg
        self.timer = StepTimer()
        self.metrics_logger = MetricsLogger(metrics_path)
        if mesh is None:
            # the batch axis must divide over the data axis; use the largest
            # device count that divides images_per_step
            n = len(jax.devices())
            while n > 1 and cfg.shapes.images_per_step % n != 0:
                n -= 1
            mesh = make_mesh(n_devices=n)
        self.mesh = mesh
        self.gen = AnchorGenerator(cfg)
        self.pnet, self.cnet = create_models(cfg)
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed or 0)
        self.init_rng, self.step_rng = jax.random.split(rng)

        self.params, self.batch_stats = init_params(cfg, self.init_rng)
        self.tx = make_optimizer(cfg)
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        self.stats = TrainingStats()

        # one compiled train step per compile bucket (a second program only
        # exists when cfg.shapes.portrait_hw is set); the primary bucket's
        # step and anchor generator stay eagerly built.
        self._steps = {tuple(cfg.shapes.image_hw): self._build_step(self.gen)}

    def _step_body(self, gen: AnchorGenerator):
        """The unjitted single-step update shared by the per-step and
        chunked (scanned) programs."""
        cfg = self.cfg
        loss_fn = build_objective(cfg, gen, self.pnet, self.cnet)

        def train_step(params, batch_stats, opt_state, batch, rng):
            (total, (new_bs, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, batch, rng)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # failure containment: skip the update when it would POISON the
            # weights — i.e. when any update element is non-finite. Guarding
            # on the LOSS value instead deadlocks: smooth-L1 (linear tail,
            # gradient clamped to +-1) and log-softmax can yield an inf
            # objective with perfectly finite gradients, and skipping those
            # steps freezes the very params that produce the inf (the
            # reference has no guard at all and trains through inf losses,
            # objective.lua:216). Logged via metrics['skipped'].
            ok = jax.tree.reduce(
                jnp.logical_and,
                jax.tree.map(lambda u: jnp.all(jnp.isfinite(u)), updates),
                jnp.asarray(True),
            )
            new_params = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_params, params
            )
            new_opt = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_opt, opt_state
            )
            new_bs = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_bs, batch_stats
            )
            metrics = dict(metrics)
            metrics["skipped"] = (~ok).astype(jnp.float32)
            return new_params, new_bs, new_opt, metrics

        return train_step

    def _batch_shardings(self, sh):
        return TrainBatch(image=sh, true_hw=sh, gt_boxes=sh, gt_classes=sh,
                          gt_mask=sh, is_background=sh)

    def _build_step(self, gen: AnchorGenerator):
        train_step = self._step_body(gen)
        rep = replicated_sharding(self.mesh)
        return jax.jit(
            train_step,
            in_shardings=(rep, rep, rep,
                          self._batch_shardings(batch_sharding(self.mesh)),
                          rep),
            out_shardings=(rep, rep, rep, rep),
            donate_argnums=(0, 1, 2),
        )

    def _build_chunk(self, gen: AnchorGenerator):
        """K train steps as ONE compiled program (lax.scan over stacked
        batches), with the per-step rng stream derived in-program exactly
        as ``run_step`` derives it — so run_chunk(K batches) produces the
        identical parameter trajectory to K run_step calls. One dispatch
        and one metrics fetch per chunk instead of per step: on a remote
        device (the axon tunnel) per-step round-trip latency dominates the
        62 ms step, and chunking amortizes it K-fold."""
        from frcnn_tpu.parallel.mesh import chunk_sharding

        train_step = self._step_body(gen)

        def chunk_step(params, batch_stats, opt_state, batches, step_rng):
            def body(carry, batch):
                p, bs, o, r = carry
                r, k = jax.random.split(r)
                p, bs, o, m = train_step(p, bs, o, batch, k)
                return (p, bs, o, r), m
            (p, bs, o, r), ms = jax.lax.scan(
                body, (params, batch_stats, opt_state, step_rng), batches
            )
            return p, bs, o, r, ms

        rep = replicated_sharding(self.mesh)
        return jax.jit(
            chunk_step,
            in_shardings=(rep, rep, rep,
                          self._batch_shardings(chunk_sharding(self.mesh)),
                          rep),
            out_shardings=(rep, rep, rep, rep, rep),
            donate_argnums=(0, 1, 2),
        )

    def _step_for(self, image_hw):
        hw = tuple(int(x) for x in image_hw)
        if hw not in self._steps:
            assert hw in {tuple(b) for b in self.cfg.shapes.buckets()}, (
                f"batch bucket {hw} not in configured buckets"
            )
            self._steps[hw] = self._build_step(
                AnchorGenerator(self.cfg, image_hw=hw)
            )
        return self._steps[hw]

    def run_step(self, batch: TrainBatch) -> Dict[str, float]:
        self.timer.start()
        self.step_rng, k = jax.random.split(self.step_rng)
        train_step = self._step_for(batch.image.shape[1:3])
        batch = shard_batch(self.mesh, batch)
        self.params, self.batch_stats, self.opt_state, metrics = train_step(
            self.params, self.batch_stats, self.opt_state, batch, k
        )
        self.step += 1
        metrics = {k2: float(v) for k2, v in metrics.items()}
        metrics["step_time_s"] = self.timer.stop()
        self.stats.append(metrics)
        self.metrics_logger.log(self.step, metrics)
        return metrics

    def run_chunk(self, batches) -> List[Dict[str, float]]:
        """Run ``len(batches)`` train steps as one device program (see
        ``_build_chunk``). All batches must share one compile bucket and a
        common chunk length compiles once per (bucket, K). Returns the
        per-step metrics dicts (also appended to stats/logger)."""
        if len(batches) == 1:
            return [self.run_step(batches[0])]
        self.timer.start()
        hw = tuple(int(x) for x in batches[0].image.shape[1:3])
        assert all(tuple(int(x) for x in b.image.shape[1:3]) == hw
                   for b in batches), "chunk batches must share one bucket"
        key = (hw, len(batches))
        if not hasattr(self, "_chunks"):
            self._chunks = {}
        if key not in self._chunks:
            gen = (self.gen if hw == tuple(self.cfg.shapes.image_hw)
                   else AnchorGenerator(self.cfg, image_hw=hw))
            self._chunks[key] = self._build_chunk(gen)
        stacked = TrainBatch(*[
            np.stack([np.asarray(getattr(b, f)) for b in batches])
            for f in TrainBatch._fields
        ])
        from frcnn_tpu.parallel.mesh import shard_chunk

        stacked = shard_chunk(self.mesh, stacked)
        (self.params, self.batch_stats, self.opt_state, self.step_rng,
         ms) = self._chunks[key](
            self.params, self.batch_stats, self.opt_state, stacked,
            self.step_rng,
        )
        ms = jax.device_get(ms)   # ONE host round trip for the whole chunk
        elapsed = self.timer.stop()
        out = []
        for i in range(len(batches)):
            self.step += 1
            m = {k2: float(v[i]) for k2, v in ms.items()}
            m["step_time_s"] = elapsed / len(batches)
            self.stats.append(m)
            self.metrics_logger.log(self.step, m)
            out.append(m)
        return out

    # -- checkpointing --------------------------------------------------------

    def save_snapshot(self, path: str, options: Optional[dict] = None):
        from frcnn_tpu.utils.serialization import save_checkpoint

        save_checkpoint(
            path,
            params=self.params,
            batch_stats=self.batch_stats,
            opt_state=self.opt_state,
            step=self.step,
            stats=self.stats.to_dict(),
            options=options or {},
            config_json=self.cfg.to_json(),
        )

    def restore_snapshot(self, path: str):
        from frcnn_tpu.utils.serialization import load_checkpoint

        ckpt = load_checkpoint(path)
        self.params = jax.device_put(ckpt["params"], replicated_sharding(self.mesh))
        self.batch_stats = jax.device_put(
            ckpt["batch_stats"], replicated_sharding(self.mesh)
        )
        if ckpt.get("opt_state") is not None:
            self.opt_state = jax.device_put(
                _restore_opt_state_like(self.opt_state, ckpt["opt_state"]),
                replicated_sharding(self.mesh),
            )
        self.step = int(ckpt.get("step", 0))
        # resume the loss history like main.lua:115-117
        self.stats = TrainingStats.from_dict(ckpt.get("stats", {}))
        return ckpt


def _restore_opt_state_like(template, loaded):
    """Rebuild the optimizer-state pytree structure (NamedTuples) from the
    raw loaded leaves."""
    leaves_t, treedef = jax.tree.flatten(template)
    leaves_l = jax.tree.leaves(loaded)
    if len(leaves_t) != len(leaves_l):
        raise ValueError("optimizer state mismatch; cannot restore")
    return jax.tree.unflatten(treedef, leaves_l)
