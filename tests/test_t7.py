"""Torch7 serialization reader + t7 training-data migration."""

import numpy as np
import pytest

from frcnn_tpu.data import t7
from frcnn_tpu.data.importers import create_manifest_from_t7, load_manifest


def roundtrip(tmp_path, obj, name="x.t7"):
    p = tmp_path / name
    t7.save(str(p), obj)
    return t7.load(str(p))


def test_scalars_strings_bools(tmp_path):
    assert roundtrip(tmp_path, 3.5) == 3.5
    assert roundtrip(tmp_path, 7) == 7
    assert roundtrip(tmp_path, "hello") == "hello"
    assert roundtrip(tmp_path, True) is True
    assert roundtrip(tmp_path, False) is False
    assert roundtrip(tmp_path, None) is None


def test_tables_and_arrays(tmp_path):
    obj = {"a": 1, "b": "two", "list": [10, 20, 30]}
    got = roundtrip(tmp_path, obj)
    assert got["a"] == 1 and got["b"] == "two"
    assert got["list"].list() == [10, 20, 30]


def test_repeated_table_memoized(tmp_path):
    shared = t7.LuaTable({1: "s"})
    obj = t7.LuaTable({"x": shared, "y": shared})
    got = roundtrip(tmp_path, obj)
    assert got["x"] is got["y"]  # same heap index -> same object


def test_tensor_roundtrip(tmp_path):
    data = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    tens = t7.TorchTensor("torch.FloatTensor", [2, 3], [3, 1], 0, data)
    got = roundtrip(tmp_path, tens)
    np.testing.assert_allclose(got.numpy(), [[1, 2, 3], [4, 5, 6]])


def test_tensor_with_offset_and_stride(tmp_path):
    # column view: offset 1, stride (1, 2) over a 2x3 row-major buffer
    data = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    tens = t7.TorchTensor("torch.DoubleTensor", [2, 2], [1, 2], 1, data)
    got = roundtrip(tmp_path, tens)
    np.testing.assert_allclose(got.numpy(), [[1, 3], [2, 4]])


def test_legacy_class_layout(tmp_path):
    """Old t7 files put the class name where the version string goes."""
    import struct

    p = tmp_path / "legacy.t7"
    with open(p, "wb") as f:
        w = t7.T7Writer(f)
        w._w("i", t7.TYPE_TORCH)
        w._w("i", 1)
        w._string(b"torch.FloatStorage")  # no "V 1" prefix
        w._w("q", 2)
        f.write(struct.pack("<2f", 1.5, 2.5))
    assert t7.load(str(p)) == [1.5, 2.5]


def _rect(minx, miny, maxx, maxy):
    return t7.TorchObject("Rect", t7.LuaTable(
        {"minX": minx, "minY": miny, "maxX": maxx, "maxY": maxy}
    ))


def _reference_traindata():
    """Fabricate the exact schema create-duplo-traindata.lua:68-79 saves."""
    gt = t7.LuaTable()
    gt["img1.png"] = t7.LuaTable({
        "image_file_name": "img1.png",
        "rois": t7.LuaTable({
            1: t7.LuaTable({
                "rect": _rect(10, 20, 110, 90),
                "class_name": "DuploBrick_2x2",
                "class_index": 1,          # 1-based in Lua
            }),
            2: t7.LuaTable({
                "rect": _rect(5, 5, 50, 60),
                "class_name": "DuploBrick_2x4",
                "class_index": 2,
            }),
        }),
    })
    gt["img2.png"] = t7.LuaTable({
        "image_file_name": "img2.png",
        "rois": t7.LuaTable({
            1: t7.LuaTable({
                "rect": _rect(1, 2, 30, 40),
                "class_name": "DuploBrick_2x4",
                "class_index": 2,
            }),
        }),
    })
    return t7.LuaTable({
        "dataset_name": "duplo-bricks",
        "ground_truth": gt,
        "training_set": t7.LuaTable({1: "img1.png"}),
        "validation_set": t7.LuaTable({1: "img2.png"}),
        "class_names": t7.LuaTable({1: "DuploBrick_2x2", 2: "DuploBrick_2x4"}),
        "class_index": t7.LuaTable({"DuploBrick_2x2": 1, "DuploBrick_2x4": 2}),
        "background_files": t7.LuaTable({1: "bg1.png"}),
    })


def test_import_reference_traindata(tmp_path):
    p = tmp_path / "duplo.t7"
    t7.save(str(p), _reference_traindata())
    out = tmp_path / "m.json"
    m = create_manifest_from_t7(str(p), str(out))
    assert m["dataset_name"] == "duplo-bricks"
    assert m["training_set"] == ["img1.png"]
    assert m["validation_set"] == ["img2.png"]
    assert m["class_names"] == ["DuploBrick_2x2", "DuploBrick_2x4"]
    # 1-based -> 0-based
    assert m["class_index"] == {"DuploBrick_2x2": 0, "DuploBrick_2x4": 1}
    rois = m["ground_truth"]["img1.png"]["rois"]
    assert rois[0]["rect"] == [10.0, 20.0, 110.0, 90.0]
    assert rois[0]["class_index"] == 0
    assert rois[1]["class_index"] == 1
    assert m["background_files"] == ["bg1.png"]
    # written file loads through the standard manifest loader
    assert load_manifest(str(out))["dataset_name"] == "duplo-bricks"


def test_import_t7_cli(tmp_path):
    import main as cli

    p = tmp_path / "duplo.t7"
    t7.save(str(p), _reference_traindata())
    out = tmp_path / "m.json"
    cli.main(["import-t7", "--t7", str(p), "--out", str(out)])
    assert load_manifest(str(out))["class_names"] == [
        "DuploBrick_2x2", "DuploBrick_2x4"
    ]


def test_reject_non_traindata(tmp_path):
    p = tmp_path / "junk.t7"
    t7.save(str(p), t7.LuaTable({"foo": 1}))
    with pytest.raises(ValueError):
        create_manifest_from_t7(str(p))


def test_truncated_file_raises_cleanly(tmp_path):
    p = tmp_path / "full.t7"
    t7.save(str(p), {"a": t7.TorchTensor(
        "torch.FloatTensor", [2, 3], [3, 1], 0, [1.0] * 6)})
    blob = p.read_bytes()
    for cut in (4, len(blob) // 2, len(blob) - 3):
        q = tmp_path / f"cut{cut}.t7"
        q.write_bytes(blob[:cut])
        with pytest.raises((EOFError, ValueError)):
            t7.load(str(q))


def test_out_of_bounds_tensor_geometry_raises(tmp_path):
    # sizes/strides claim more elements than the storage holds: must be a
    # clean error, not an out-of-bounds as_strided read
    bad = t7.TorchTensor("torch.FloatTensor", [4, 4], [4, 1], 0, [1.0] * 6)
    got = roundtrip(tmp_path, bad)
    with pytest.raises(ValueError, match="corrupt t7 tensor"):
        got.numpy()
    # offset pushing the span past the end
    bad2 = t7.TorchTensor("torch.FloatTensor", [2], [1], 5, [1.0] * 6)
    got2 = roundtrip(tmp_path, bad2, "y.t7")
    with pytest.raises(ValueError, match="corrupt t7 tensor"):
        got2.numpy()


def test_self_referential_object(tmp_path):
    """A torch.class instance whose state refers back to itself (common
    parent/owner back-pointers in Torch7 object graphs)."""
    import struct

    p = tmp_path / "selfref.t7"
    with open(p, "wb") as f:
        w = t7.T7Writer(f)
        # TORCH record idx 1, class "Node", state table idx 2 containing
        # {"me": <TORCH idx 1>}
        w._w("i", t7.TYPE_TORCH)
        w._w("i", 1)
        w._string(b"V 1")
        w._string(b"Node")
        w._w("i", t7.TYPE_TABLE)
        w._w("i", 2)
        w._w("i", 1)  # one pair
        w.write("me")
        w._w("i", t7.TYPE_TORCH)
        w._w("i", 1)  # back-reference to the object being read
    got = t7.load(str(p))
    assert isinstance(got, t7.TorchObject)
    assert got.torch_class == "Node"
    assert got.state["me"] is got
