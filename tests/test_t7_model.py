"""Reference model-snapshot bridge tests (data/t7_model.py).

Covers the flat-weight format of ``utilities.lua:126-147``
(``save_model`` / ``combine_and_flatten_parameters``):

- exact flatten/unflatten roundtrip, both candidate module orders,
- .t7 file roundtrip through the real reader/writer,
- automatic module-order diagnosis from PReLU-slope plausibility,
- loud failure on a config/snapshot size mismatch,
- detect-output equality on imported weights,
- and the strongest check available without a Lua runtime: the reference
  architecture rebuilt in PyTorch, loaded from the SAME flat vector by the
  documented layout, must produce the same pnet anchor maps / feature map
  and cnet outputs as our flax models (catches any transpose or
  permutation error in the conversion, not just self-consistency).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frcnn_tpu.data.t7_model import (
    choose_order,
    diagnose_order,
    flat_size,
    flatten_params,
    load_reference_model,
    save_reference_model,
    unflatten_params,
)
from frcnn_tpu.models.factory import create_models, init_params
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params, stats = init_params(cfg, jax.random.PRNGKey(7))
    return cfg, params, stats


def _tree_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("order", ["nngraph", "blocks_first", "interleaved"])
def test_flatten_roundtrip_exact(setup, order):
    cfg, params, _ = setup
    flat = flatten_params(params, cfg, order)
    assert flat.shape == (flat_size(cfg),)
    back = unflatten_params(flat, cfg, params, order)
    _tree_equal(params, back)


def test_orders_differ(setup):
    """The candidate layouts must actually produce different files —
    otherwise the order plumbing is vacuous. For the reference configs
    (anchor inputs 3,4,4,4) the derived nngraph order coincides with the
    by-block 'interleaved' layout."""
    cfg, params, _ = setup
    a = flatten_params(params, cfg, "blocks_first")
    b = flatten_params(params, cfg, "nngraph")
    assert a.shape == b.shape and not np.array_equal(a, b)
    np.testing.assert_array_equal(
        b, flatten_params(params, cfg, "interleaved")
    )


def test_nngraph_order_is_output_major(setup):
    """The derived topsort rule (see t7_model module docstring): per
    gModule output in declaration order, emit the not-yet-emitted producer
    chain deepest-first. Anchor inputs (3,4,4,4) -> b1 b2 b3 a1 b4 a2+."""
    from frcnn_tpu.data.t7_model import _spec_entries

    cfg, _, _ = setup
    names = [n for net, n, _ in _spec_entries(cfg, "nngraph")
             if net == "pnet"]
    # collapse conv/prelu module names to block/anchor sequence
    seq = []
    for n in names:
        tag = n.split("/")[0]
        key = ("b" + tag[5] if tag.startswith("block")
               else "a" + tag[6])
        if not seq or seq[-1] != key:
            seq.append(key)
    assert seq == ["b0", "b1", "b2", "a0", "b3", "a1", "a2", "a3"], seq


def test_nngraph_differs_from_interleaved_when_declaration_order_flips():
    """For a config whose FIRST declared anchor reads the LAST block, the
    output-major topsort emits all blocks before any anchor — unlike the
    by-block 'interleaved' heuristic. Guards the distinction the derived
    order exists for."""
    import dataclasses

    from frcnn_tpu.data.t7_model import _spec_entries
    from tests.tiny import tiny_config

    cfg = tiny_config()
    nets = list(cfg.model.anchor_nets)
    # swap inputs: first anchor reads block 4, second reads block 3
    nets[0] = dataclasses.replace(nets[0], input=4)
    nets[1] = dataclasses.replace(nets[1], input=3)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, anchor_nets=tuple(nets))
    )
    ng = [n for net, n, _ in _spec_entries(cfg, "nngraph") if net == "pnet"]
    il = [n for net, n, _ in _spec_entries(cfg, "interleaved")
          if net == "pnet"]
    assert ng != il
    # nngraph: a0 (needs b0..b3) comes first among anchors, then a1
    first_anchor = next(n for n in ng if n.startswith("anchor"))
    assert first_anchor.startswith("anchor0")
    # every block precedes every anchor under nngraph here
    last_block = max(i for i, n in enumerate(ng) if n.startswith("block"))
    first_anch = min(i for i, n in enumerate(ng) if n.startswith("anchor"))
    assert last_block < first_anch


def test_file_roundtrip_and_auto_order(setup, tmp_path):
    cfg, params, stats = setup
    for order in ("blocks_first", "nngraph"):
        path = str(tmp_path / f"model_{order}.t7")
        save_reference_model(path, params, cfg, order=order,
                             options={"lr": 1e-4}, stats={"i": 3})
        loaded, meta = load_reference_model(path, cfg, params, order="auto")
        assert meta["order"] == order, meta["order_diagnosis"]
        _tree_equal(params, loaded)
        # all slope slots plausible under the true order
        n_prelu = meta["order_diagnosis"][order]
        assert n_prelu == max(meta["order_diagnosis"].values())


def test_size_mismatch_raises(setup):
    cfg, params, _ = setup
    flat = flatten_params(params, cfg)
    with pytest.raises(ValueError, match="wrong config"):
        unflatten_params(flat[:-10], cfg, params)


def test_not_a_model_snapshot(setup, tmp_path):
    from frcnn_tpu.data.t7 import save

    cfg, params, _ = setup
    path = str(tmp_path / "not_model.t7")
    save(path, {"something": 1.0})
    with pytest.raises(ValueError, match="not a reference model"):
        load_reference_model(path, cfg, params)


def test_detect_outputs_match_on_imported_weights(setup, tmp_path):
    """Import(export(params)) must detect EXACTLY what params detects."""
    from frcnn_tpu.detect.detector import build_detect_fn
    from frcnn_tpu.geometry.anchors import AnchorGenerator
    from tests.test_detector import _force_fg_params

    cfg, params, stats = setup
    cfg = cfg.replace(compute_dtype="float32")
    params = _force_fg_params(cfg, params)
    path = str(tmp_path / "m.t7")
    save_reference_model(path, params, cfg)
    imported, _ = load_reference_model(path, cfg, params)

    pnet, cnet = create_models(cfg)
    gen = AnchorGenerator(cfg)
    fn = jax.jit(build_detect_fn(cfg, gen, pnet, cnet))
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(0.3, 0.2, (1, H, W, 3)).astype(np.float32))
    hw = jnp.asarray([[H, W]], jnp.int32)
    o1 = fn(params, stats, imgs, hw)
    o2 = fn(imported, stats, imgs, hw)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _torch_reference_nets(cfg, flat):
    """The reference architecture (``models/model_utilities.lua:3-124``)
    rebuilt in PyTorch, parameters loaded from the flat vector in the
    blocks_first layout. Returns (pnet_fn, cnet_fn) running in eval mode."""
    import torch
    import torch.nn as tnn

    m = cfg.model
    convs = []            # torch modules in flat order, for loading
    blocks = []
    in_ch = 3
    for layer in m.layers:
        steps = []
        ic = in_ch
        for _ in range(layer.conv_steps):
            c = tnn.Conv2d(ic, layer.filters, (layer.kH, layer.kW),
                           padding=(layer.padH, layer.padW))
            p = tnn.PReLU()
            steps += [c, p]
            convs += [c, p]
            ic = layer.filters
        steps.append(tnn.MaxPool2d(2, 2, ceil_mode=True))
        blocks.append(tnn.Sequential(*steps))
        in_ch = layer.filters
    anchor_nets = []
    for a in m.anchor_nets:
        src = m.layers[a.input - 1].filters
        c1 = tnn.Conv2d(src, a.n, a.kW)
        p = tnn.PReLU()
        c2 = tnn.Conv2d(a.n, 18, 1)
        anchor_nets.append(tnn.Sequential(c1, p, c2))
        convs += [c1, p, c2]

    kh, kw = cfg.roi_pooling.kh, cfg.roi_pooling.kw
    n_in = kh * kw * m.layers[-1].filters
    trunk = []
    for spec in m.class_layers:
        lin = tnn.Linear(n_in, spec.n)
        trunk.append(lin)
        convs.append(lin)
        if spec.batch_norm:
            bn = tnn.BatchNorm1d(spec.n)
            trunk.append(bn)
            convs.append(bn)
        p = tnn.PReLU()
        trunk.append(p)
        convs.append(p)
        n_in = spec.n
    trunk_seq = tnn.Sequential(*trunk)
    rout = tnn.Linear(n_in, 4)
    cout = tnn.Linear(n_in, cfg.class_count + 1)
    convs += [rout, cout]

    # load the flat vector exactly like nn.Module.flatten laid it out
    pos = 0
    with torch.no_grad():
        for mod in convs:
            for p in mod.parameters():
                n = p.numel()
                p.copy_(torch.from_numpy(
                    flat[pos:pos + n].reshape(tuple(p.shape)).copy()))
                pos += n
    assert pos == flat.size
    for mod in convs:
        mod.eval()
    for b in blocks:
        b.eval()

    def pnet_fn(x_nchw):
        with torch.no_grad():
            outs = []
            h = x_nchw
            feats = []
            for b in blocks:
                h = b(h)
                feats.append(h)
            for a, spec in zip(anchor_nets, m.anchor_nets):
                outs.append(a(feats[spec.input - 1]))
            return outs, feats[-1]

    def cnet_fn(x):
        with torch.no_grad():
            h = trunk_seq(x)
            return rout(h), torch.log_softmax(cout(h), dim=-1)

    return pnet_fn, cnet_fn


def test_torch_forward_parity_on_flat_vector(setup):
    """Ground-truth check of the layout conversion: PyTorch modules loaded
    from the SAME flat vector must compute the same functions."""
    import torch

    cfg, params, stats = setup
    cfg = cfg.replace(compute_dtype="float32")
    flat = flatten_params(params, cfg, "blocks_first")
    pnet_t, cnet_t = _torch_reference_nets(cfg, flat)
    pnet, cnet = create_models(cfg)

    rng = np.random.default_rng(3)
    H, W = cfg.shapes.image_hw
    img = rng.normal(0, 1, (2, H, W, 3)).astype(np.float32)
    maps_j, fm_j = pnet.apply({"params": params["pnet"]},
                              jnp.asarray(img), train=False)
    maps_t, fm_t = pnet_t(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    for mj, mt in zip(maps_j, maps_t):
        np.testing.assert_allclose(
            np.asarray(mj), mt.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )
    np.testing.assert_allclose(
        np.asarray(fm_j), fm_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4,
    )

    # cnet: feed the SAME pooled features to both, accounting for the
    # (y,x,c) vs (c,y,x) flatten orders of the two frameworks
    kh, kw = cfg.roi_pooling.kh, cfg.roi_pooling.kw
    C = cfg.model.layers[-1].filters
    pooled = rng.normal(0, 1, (5, kh, kw, C)).astype(np.float32)
    ours_in = pooled.reshape(5, -1)                       # (y, x, c)
    torch_in = pooled.transpose(0, 3, 1, 2).reshape(5, -1)  # (c, y, x)
    reg_j, logp_j = cnet.apply(
        {"params": params["cnet"], "batch_stats": stats["cnet"]},
        jnp.asarray(ours_in), train=False,
    )
    reg_t, logp_t = cnet_t(torch.from_numpy(torch_in))
    np.testing.assert_allclose(np.asarray(reg_j), reg_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logp_j), logp_t.numpy(),
                               rtol=1e-4, atol=1e-4)
