"""Reference model-snapshot bridge: Torch7 flat weight vector <-> pytree.

The reference persists trained networks as ONE flat float tensor
(``utilities.lua:126-134`` ``save_model`` writes ``{version=0, weights,
options, stats}``; ``main.lua:92-97`` restores by copying it back into the
freshly-built nets' flattened parameters). The flat layout is defined by
``combine_and_flatten_parameters(pnet, cnet)`` (``utilities.lua:136-147``):
``pnet:parameters()`` then ``cnet:parameters()``, each tensor concatenated
in module order, row-major.

Module order. The pnet is an nngraph ``gModule``
(``models/model_utilities.lua:58`` builds it with outputs
``{anchor1..anchor4, last_conv_output}``) whose ``parameters()`` order is
``self.modules`` order, which ``gModule.__init`` fills by iterating
``self.forwardnodes = fg:topsort()``. In torch/graph's public source,
``Graph:topsort()`` reverses the graph and runs ``Node:dfs`` — a
POST-ORDER depth-first visit (``func`` fires after recursing into
children) — from the reversed graph's root, the gModule's dummy output
node, whose children are the declared outputs in declaration order. A
post-order DFS over the reversed graph emits every node after all of its
producers, i.e. the derived rule is:

    for each gModule OUTPUT in declaration order, emit its
    not-yet-emitted producer chain, deepest (closest to input) first.

For the reference's outputs ``{a1, a2, a3, a4, fm}`` with anchor inputs
(3, 4, 4, 4) that is: b1 b2 b3 a1 b4 a2 a3 a4 — ``order='nngraph'``, the
default. Two legacy layouts remain accepted:

- ``blocks_first``: conv blocks 1..4, then anchor nets 1..4 — the node
  *instantiation* order of ``model_utilities.lua:44-56`` (NOT what
  nngraph produces, kept for round-2/3 exported files);
- ``interleaved``: each anchor net right after the conv block it reads —
  identical to ``nngraph`` for the reference configs (anchor inputs
  3,4,4,4), differing only for hypothetical configs whose anchor
  declaration order disagrees with block depth order.

No Torch7/Lua runtime exists on this box to observe the order directly,
so ``order='auto'`` additionally verifies by plausibility: a PReLU's
single learnable slope is initialized to 0.25 and stays in (0, 2) in any
sanely trained net, while a misaligned layout lands those 13+ scalars on
arbitrary conv-weight entries (zero-mean, half negative) — the
probability that ALL land in (0, 2) by chance is ~2^-13. Ties prefer the
derived ``nngraph`` order. Export uses the same order machinery, so
import(export(p)) == p for every choice.

What is NOT in the file: BatchNorm running statistics. Torch's
``parameters()`` returns only learnable tensors, so the reference's own
save/restore cycle silently resets its cnet BatchNorm running estimates
(they re-converge during further training; at inference the reference runs
``evaluate()`` with whatever stats the process accumulated). We mirror
that: import returns freshly-initialized ``batch_stats``.

The one layout divergence handled here beyond transposes: the first cnet
Linear consumes the flattened ROI pool, which Torch flattens channel-first
(c, y, x) from its [C, kh, kw] pooled tensor while our NHWC pool flattens
(y, x, c) — fc0's input dimension is permuted accordingly.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from frcnn_tpu.config import Config
from frcnn_tpu.data.t7 import TorchTensor, load, save

PRELU_INIT = 0.25   # torch nn.PReLU default


def _t2f_conv(w: np.ndarray) -> np.ndarray:
    """Torch SpatialConvolution weight [out, in, kH, kW] -> flax
    [kH, kW, in, out]."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _f2t_conv(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(k.transpose(3, 2, 0, 1))


def _t2f_linear(w: np.ndarray) -> np.ndarray:
    """Torch Linear weight [out, in] -> flax kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def _f2t_linear(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(k.T)


def _pool_perm(kh: int, kw: int, c: int) -> np.ndarray:
    """perm[ours_flat_index] = torch_flat_index for the pooled features.

    Ours: j = (y * kw + x) * c + ch  (NHWC pool [kh, kw, C], roi_pool.py);
    torch: t = (ch * kh + y) * kw + x  ([C, kh, kw], objective.lua:97).
    """
    y, x, ch = np.meshgrid(np.arange(kh), np.arange(kw), np.arange(c),
                           indexing="ij")
    return ((ch * kh + y) * kw + x).reshape(-1)


def _spec_entries(cfg: Config, order: str) -> List[Tuple[str, str, tuple]]:
    """The flat layout: [(net, param_name, torch_shape), ...] in file order.

    ``param_name`` is the path in our param tree (``net/module/leaf``);
    torch_shape is the tensor's shape inside the flat vector.
    """
    m = cfg.model
    blocks: List[List[Tuple[str, str, tuple]]] = []
    in_ch = 3
    for bi, layer in enumerate(m.layers):
        entries = []
        ic = in_ch
        for si in range(layer.conv_steps):
            entries.append((f"block{bi}_conv{si}/kernel",
                            (layer.filters, ic, layer.kH, layer.kW)))
            entries.append((f"block{bi}_conv{si}/bias", (layer.filters,)))
            entries.append((f"block{bi}_prelu{si}/slope", (1,)))
            ic = layer.filters
        in_ch = layer.filters
        blocks.append(entries)
    anchors: List[List[Tuple[str, tuple]]] = []
    for ai, a in enumerate(m.anchor_nets):
        src_filters = m.layers[a.input - 1].filters   # a.input is 1-based
        anchors.append([
            (f"anchor{ai}_conv/kernel", (a.n, src_filters, a.kW, a.kW)),
            (f"anchor{ai}_conv/bias", (a.n,)),
            (f"anchor{ai}_prelu/slope", (1,)),
            (f"anchor{ai}_out/kernel", (18, a.n, 1, 1)),
            (f"anchor{ai}_out/bias", (18,)),
        ])
    pnet: List[Tuple[str, tuple]] = []
    if order == "blocks_first":
        for b in blocks:
            pnet += b
        for a in anchors:
            pnet += a
    elif order == "nngraph":
        # simulate gModule's topsort (see module docstring): per OUTPUT in
        # declaration order (a1..a4 then the final feature map), emit its
        # not-yet-emitted producer chain deepest-first. The conv blocks
        # form a single path, so a chain is always a block prefix.
        done = 0
        for ai, a in enumerate(m.anchor_nets):
            while done < a.input:        # a.input is 1-based block count
                pnet += blocks[done]
                done += 1
            pnet += anchors[ai]
        while done < len(blocks):        # fm output: remaining blocks
            pnet += blocks[done]
            done += 1
    elif order == "interleaved":
        emitted = [False] * len(anchors)
        for bi, b in enumerate(blocks):
            pnet += b
            for ai, a in enumerate(cfg.model.anchor_nets):
                if not emitted[ai] and a.input - 1 <= bi:
                    pnet += anchors[ai]
                    emitted[ai] = True
    else:
        raise ValueError(f"unknown order {order!r}")

    cnet: List[Tuple[str, tuple]] = []
    n_in = cfg.roi_pooling.kh * cfg.roi_pooling.kw * m.layers[-1].filters
    for li, spec in enumerate(m.class_layers):
        cnet.append((f"fc{li}/kernel", (spec.n, n_in)))
        cnet.append((f"fc{li}/bias", (spec.n,)))
        if spec.batch_norm:
            cnet.append((f"bn{li}/scale", (spec.n,)))
            cnet.append((f"bn{li}/bias", (spec.n,)))
        cnet.append((f"prelu{li}/slope", (1,)))
        n_in = spec.n
    cnet.append(("reg_head/kernel", (4, n_in)))
    cnet.append(("reg_head/bias", (4,)))
    cnet.append(("cls_head/kernel", (cfg.class_count + 1, n_in)))
    cnet.append(("cls_head/bias", (cfg.class_count + 1,)))

    return ([("pnet", name, shape) for name, shape in pnet]
            + [("cnet", name, shape) for name, shape in cnet])


def flat_size(cfg: Config) -> int:
    return sum(int(np.prod(s)) for _, _, s in _spec_entries(cfg, "nngraph"))


def flatten_params(params: Dict, cfg: Config,
                   order: str = "nngraph") -> np.ndarray:
    """Our param pytree -> the reference's flat float32 vector."""
    kh, kw = cfg.roi_pooling.kh, cfg.roi_pooling.kw
    c_last = cfg.model.layers[-1].filters
    perm = _pool_perm(kh, kw, c_last)
    chunks = []
    for net, name, tshape in _spec_entries(cfg, order):
        mod, leaf = name.split("/")
        ours = np.asarray(params[net][mod][leaf], np.float32)
        if leaf == "kernel" and ours.ndim == 4:
            t = _f2t_conv(ours)
        elif leaf == "kernel":
            if net == "cnet" and mod == "fc0":
                # undo the pooled-feature permutation on the input dim
                inv = np.empty_like(perm)
                inv[perm] = np.arange(perm.size)
                ours = ours[inv]
            t = _f2t_linear(ours)
        elif leaf == "slope":
            t = ours.reshape(1)
        else:
            t = ours
        if t.shape != tshape:
            raise ValueError(
                f"{net}/{name}: converted shape {t.shape} != expected "
                f"torch shape {tshape} — config does not match the params"
            )
        chunks.append(t.reshape(-1))
    return np.concatenate(chunks).astype(np.float32)


def unflatten_params(flat: np.ndarray, cfg: Config, params_template: Dict,
                     order: str = "nngraph") -> Dict:
    """The reference's flat vector -> a copy of ``params_template`` with
    every covered leaf replaced. Raises on length mismatch."""
    flat = np.asarray(flat, np.float32).reshape(-1)
    entries = _spec_entries(cfg, order)
    want = sum(int(np.prod(s)) for _, _, s in entries)
    if flat.size != want:
        raise ValueError(
            f"flat weight vector has {flat.size} elements; the config's "
            f"networks have {want} — wrong config/model for this snapshot"
        )
    kh, kw = cfg.roi_pooling.kh, cfg.roi_pooling.kw
    perm = _pool_perm(kh, kw, cfg.model.layers[-1].filters)
    import jax

    out = jax.tree.map(lambda x: x, params_template)   # shallow copy tree
    pos = 0
    for net, name, tshape in entries:
        n = int(np.prod(tshape))
        t = flat[pos:pos + n].reshape(tshape)
        pos += n
        mod, leaf = name.split("/")
        if leaf == "kernel" and len(tshape) == 4:
            ours = _t2f_conv(t)
        elif leaf == "kernel":
            ours = _t2f_linear(t)
            if net == "cnet" and mod == "fc0":
                ours = ours[perm]
        elif leaf == "slope":
            ours = t.reshape(np.shape(out[net][mod][leaf]))
        else:
            ours = t
        prev = out[net][mod][leaf]
        if np.shape(ours) != np.shape(prev):
            raise ValueError(
                f"{net}/{name}: {np.shape(ours)} != template "
                f"{np.shape(prev)}"
            )
        out[net] = dict(out[net])
        out[net][mod] = dict(out[net][mod])
        out[net][mod][leaf] = np.asarray(ours, np.float32)
    return out


def _slope_plausibility(flat: np.ndarray, cfg: Config, order: str) -> int:
    """Number of PReLU-slope slots that land in (0, 2) under ``order``."""
    flat = np.asarray(flat).reshape(-1)
    pos, hits = 0, 0
    for _, name, tshape in _spec_entries(cfg, order):
        n = int(np.prod(tshape))
        if name.split("/")[1] == "slope":
            v = flat[pos]
            hits += int(0.0 < v < 2.0)
        pos += n
    return hits


def diagnose_order(flat: np.ndarray, cfg: Config) -> Dict[str, int]:
    """PReLU-slope plausibility per candidate order (see module docstring).
    ``nngraph`` is listed first so ties resolve to the derived order."""
    return {o: _slope_plausibility(flat, cfg, o)
            for o in ("nngraph", "blocks_first")}


def choose_order(flat: np.ndarray, cfg: Config) -> str:
    scores = diagnose_order(flat, cfg)
    return max(scores, key=lambda k: scores[k])  # max is first-wins on ties


def save_reference_model(path: str, params: Dict, cfg: Config,
                         options: Dict | None = None,
                         stats: Dict | None = None,
                         order: str = "nngraph") -> None:
    """Write a reference-loadable snapshot (``utilities.lua:126-134``)."""
    flat = flatten_params(params, cfg, order)
    weights = TorchTensor(
        "torch.FloatTensor", [int(flat.size)], [1], 0, flat.tolist()
    )
    save(path, {"version": 0, "weights": weights,
                "options": options or {}, "stats": stats or {}})


def load_reference_model(path: str, cfg: Config, params_template: Dict,
                         order: str = "auto"):
    """Read a reference snapshot. Returns ``(params, meta)`` where meta
    carries the file's options/stats tables plus the order diagnosis."""
    obj = load(path)
    try:
        weights = obj[b"weights"] if b"weights" in obj else obj["weights"]
    except (TypeError, KeyError):
        raise ValueError(f"{path} is not a reference model snapshot "
                         "(no 'weights' field)") from None
    flat = weights.numpy().astype(np.float32).reshape(-1)
    diagnosis = diagnose_order(flat, cfg)
    used = choose_order(flat, cfg) if order == "auto" else order
    params = unflatten_params(flat, cfg, params_template, used)

    def _get(k):
        return obj.get(k.encode(), obj.get(k))

    meta = {"order": used, "order_diagnosis": diagnosis,
            "options": _get("options"), "stats": _get("stats"),
            "version": _get("version")}
    return params, meta
