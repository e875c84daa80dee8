"""Data-parallel batched serving over a device mesh.

The reference serves one image at a time on one GPU
(``Detector.lua:17-141``). Here the whole detect program (normalize ->
pnet -> dense decode -> proposal NMS -> ROI pool -> cnet -> per-class NMS)
runs under one jit with the image batch sharded over the mesh's data axis
and parameters replicated — XLA partitions every stage (all are
batch-parallel; no cross-image communication exists in detection, so the
program lowers with zero collectives on the hot path).

Throughput scales linearly in chips as long as the host can feed
``images_per_chip x n_chips`` batches; use the multi-host input sharding
hooks (``data/pipeline.py`` ``shard_index/num_shards``) to split decode
across hosts over DCN.
"""

from __future__ import annotations

import jax

from frcnn_tpu.config import Config
from frcnn_tpu.detect.detector import build_detect_fn
from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
)


class ShardedDetector:
    """Mesh-parallel version of :class:`frcnn_tpu.detect.detector.Detector`.

    ``detect(images, true_hw)``: ``images`` [B, H, W, 3] with B divisible
    by the mesh's device count; outputs are batch-sharded
    :class:`DetectionResult` arrays ([B, D, ...] — ``np.asarray`` gathers
    them when the host consumes results).
    """

    def __init__(self, cfg: Config, params, batch_stats, mesh,
                 gen=None, pnet=None, cnet=None, quantized: bool = False,
                 quant_calibration=None):
        from frcnn_tpu.models.factory import create_models

        self.cfg = cfg
        self.mesh = mesh
        if pnet is None or cnet is None:
            pnet, cnet = create_models(cfg)
        if quantized:
            from frcnn_tpu.models.factory import compute_dtype
            from frcnn_tpu.models.quant import (
                QuantizedPNetAdapter,
                quantize_pnet_params,
            )

            qparams = quantize_pnet_params(params, cfg.model)
            pnet = QuantizedPNetAdapter(
                cfg.model, qparams, act_dtype=compute_dtype(cfg),
                pool_s8=cfg.quant_pool_s8,
            )
            if quant_calibration is not None:
                from frcnn_tpu.detect.detector import calibrate_quantized_pnet

                calibrate_quantized_pnet(cfg, pnet, params, quant_calibration)
        self.pnet, self.cnet = pnet, cnet
        rep = replicated_sharding(mesh)
        self.params = jax.device_put(params, rep)
        self.batch_stats = jax.device_put(batch_stats, rep)
        self._programs = {}
        self._gen_primary = gen or AnchorGenerator(cfg)
        self._programs[tuple(self._gen_primary.image_hw)] = self._jit(
            self._gen_primary
        )

    def _jit(self, gen):
        from jax.sharding import PartitionSpec as P

        from frcnn_tpu.parallel.mesh import DATA_AXIS

        # shard_map, NOT bare jit-with-shardings: the detect program
        # contains pallas_call custom calls (NMS / ROI pool / fused s2d
        # block0) whose grids XLA's SPMD partitioner cannot split — under
        # plain jit they would be traced at the GLOBAL batch size and
        # either fail to partition or run gathered+replicated. shard_map
        # traces the body at the per-device batch (B/n), so every Pallas
        # grid is local; detection is embarrassingly batch-parallel so
        # the body needs no collectives.
        fn = build_detect_fn(self.cfg, gen, self.pnet, self.cnet)
        dat, rep = P(DATA_AXIS), P()
        mapped = jax.shard_map(
            fn, mesh=self.mesh,
            in_specs=(rep, rep, dat, dat),
            out_specs=dat,
            check_vma=False,
        )
        return jax.jit(mapped)

    def _program_for(self, image_hw):
        hw = tuple(int(x) for x in image_hw)
        if hw not in self._programs:
            assert hw in {tuple(b) for b in self.cfg.shapes.buckets()}, (
                f"image bucket {hw} not in configured buckets"
            )
            self._programs[hw] = self._jit(AnchorGenerator(self.cfg, image_hw=hw))
        return self._programs[hw]

    def detect(self, images, true_hw):
        """``images``: [B, H, W, 3] NHWC, or with ``cfg.input_layout='s2d'``
        optionally an already-packed (lum4, chroma) pair. The
        space-to-depth pack runs host-side (threaded C++ packer, numpy
        fallback) before sharding — both plane arrays are batch-major, so
        the data sharding broadcasts over the pair."""
        n = self.mesh.devices.size
        dat = batch_sharding(self.mesh)
        if getattr(self.cfg, "input_layout", "nhwc") == "s2d":
            if isinstance(images, (tuple, list)):
                lum4, chroma = images
                hc, wc = chroma.shape[1], chroma.shape[3]
                hw = ((hc - 1) * 2, (wc - 1) * 2)
            else:
                import numpy as np

                from frcnn_tpu.data import native
                from frcnn_tpu.ops.pallas_block0 import pack_s2d_np

                hw = images.shape[1:3]
                # uint8 wire (Config.uint8_wire): unwire host-side —
                # the s2d pack wants float target-color-space canvases
                from frcnn_tpu.ops.color import unwire_uint8

                images = unwire_uint8(np.asarray(images),
                                      self.cfg.color_space)
                packed = native.pack_s2d_batch(images)
                lum4, chroma = (packed if packed is not None
                                else pack_s2d_np(images))
            assert lum4.shape[0] % n == 0, (
                f"batch {lum4.shape[0]} must divide over {n} devices"
            )
            images = jax.device_put((lum4, chroma), dat)
        else:
            assert images.shape[0] % n == 0, (
                f"batch {images.shape[0]} must divide over {n} devices"
            )
            hw = images.shape[1:3]
            images = jax.device_put(images, dat)
        true_hw = jax.device_put(true_hw, dat)
        fn = self._program_for(hw)
        return fn(self.params, self.batch_stats, images, true_hw)
