"""CLI surface end-to-end on the synthetic dataset (tiny config JSON):
import-duplo -> train 2 steps (+snapshot+plot+metrics) -> restore ->
demo -> evaluate."""

import json
import os

import numpy as np
import pytest

import main as cli
from tests.test_e2e_synthetic import make_dataset
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    make_dataset(tmp, n=8)
    cfg = tiny_config().replace(
        target_smaller_side=128,
        max_pixel_size=192,
        examples_base_path=str(tmp),
        snapshot_interval=2,
        plot_interval=2,
    )
    cfg_path = tmp / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    return tmp, str(cfg_path)


def test_import_and_train_and_demo(workdir, monkeypatch):
    tmp, cfg_path = workdir
    monkeypatch.chdir(tmp)

    # import (the manifest from make_dataset already exists; regenerate via CLI)
    cli.main([
        "import-duplo", "--csv", str(tmp / "boxes.csv"),
        "--out", str(tmp / "m2.json"), "--name", "synthetic",
    ])
    assert os.path.exists(tmp / "m2.json")

    cli.main([
        "train", "--cfg", cfg_path, "--train", str(tmp / "m2.json"),
        "--name", "cli_test", "--steps", "2",
    ])
    assert os.path.exists(tmp / "cli_test_000002.ckpt")
    assert os.path.exists(tmp / "cli_test_progress.png")
    assert os.path.exists(tmp / "cli_test_progress.csv")
    assert os.path.exists(tmp / "cli_test_metrics.jsonl")
    with open(tmp / "cli_test_metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 2 and "pcls" in recs[0] and "step_time_s" in recs[0]

    cli.main([
        "demo", "--cfg", cfg_path, "--train", str(tmp / "m2.json"),
        "--restore", str(tmp / "cli_test_000002.ckpt"),
        "--out", str(tmp / "demo"), "--count", "2",
    ])
    assert os.path.exists(tmp / "demo" / "output1.jpg")
    assert os.path.exists(tmp / "demo" / "output2.jpg")


def test_train_chunked_loop(workdir, monkeypatch):
    """--chunk > 1: K steps per device dispatch. Snapshots land at chunk
    boundaries named with the true step; one metrics record per step.
    (Trajectory equivalence vs chunk=1 is covered at the trainer level,
    tests/test_trainer.py::test_run_chunk_matches_run_step_trajectory.)"""
    tmp, cfg_path = workdir
    monkeypatch.chdir(tmp)
    cli.main([
        "train", "--cfg", cfg_path, "--train", str(tmp / "manifest.json"),
        "--name", "cli_chunk", "--steps", "5", "--chunk", "2",
    ])
    # interval=2, chunks end at steps 2,4,5 -> snapshots at 2, 4
    assert os.path.exists(tmp / "cli_chunk_000002.ckpt")
    assert os.path.exists(tmp / "cli_chunk_000004.ckpt")
    with open(tmp / "cli_chunk_metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert [r["step"] for r in recs] == [1, 2, 3, 4, 5]


def test_t7_model_export_import_cycle(workdir, monkeypatch):
    """export-t7-model writes a reference-format snapshot; import-t7-model
    converts it back into a checkpoint whose params are bit-identical
    (depends on the checkpoint test_import_and_train_and_demo produced)."""
    import jax

    from frcnn_tpu.utils.serialization import load_checkpoint

    tmp, cfg_path = workdir
    monkeypatch.chdir(tmp)
    src = str(tmp / "cli_test_000002.ckpt")
    assert os.path.exists(src)
    cli.main([
        "export-t7-model", "--cfg", cfg_path, "--restore", src,
        "--out", str(tmp / "exported.t7"),
    ])
    cli.main([
        "import-t7-model", "--cfg", cfg_path, "--t7", str(tmp / "exported.t7"),
        "--out", str(tmp / "imported.ckpt"),
    ])
    a = load_checkpoint(src)
    b = load_checkpoint(str(tmp / "imported.ckpt"))
    for x, y in zip(jax.tree.leaves(a["params"]), jax.tree.leaves(b["params"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # export default = the derived gModule topsort order; auto-detect on
    # import must agree
    assert b["options"]["order"] == "nngraph"


def test_evaluate_runs(workdir, monkeypatch, capsys):
    tmp, cfg_path = workdir
    monkeypatch.chdir(tmp)
    cli.main([
        "evaluate", "--cfg", cfg_path, "--train", str(tmp / "manifest.json"),
        "--count", "2",
    ])
    out = capsys.readouterr().out
    result = json.loads(out)
    assert "mAP" in result and result["num_images"] == 2
