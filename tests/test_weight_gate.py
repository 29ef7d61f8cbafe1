"""The weight-commit fidelity gate (round-4 fix for VERDICT r3 weak #1).

Invariant: a trained-weights file exists in ``deepfake_vit_tpu/weights/``
ONLY if it passed its family's acceptance bars. Mechanics under test:

- ``scripts/train_detector.py`` refuses ``--save`` into the shipped dir
  (per-epoch checkpoints there would equate presence with "epoch 1 done");
- ``default_weights_path`` honors ``DFV_WEIGHTS_<MODEL>`` so the promotion
  script can run acceptance tests against a STAGED candidate;
- ``scripts/promote_weights.py`` maps every family to real test node ids
  and promotes atomically.

Reference counterpart: the trust contract of the pretrained buffalo_l
download (``src/preprocessing/face_detector.py:220-227``).
"""

import importlib.util
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name, REPO / rel)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


train_detector = _load("_gate_train_detector", "scripts/train_detector.py")
promote_weights = _load("_gate_promote_weights", "scripts/promote_weights.py")


def test_save_refuses_shipped_dir():
    shipped = REPO / "deepfake_vit_tpu" / "weights"
    assert train_detector.save_targets_shipped_dir(str(shipped / "x.msgpack"))
    assert train_detector.save_targets_shipped_dir(str(shipped / "sub" / "x.msgpack"))
    # Relative spellings resolve against the cwd, so the exact round-3
    # incident command line is caught when run from the repo root.
    assert train_detector.save_targets_shipped_dir(
        str(shipped.relative_to(REPO) / "lite_synface.msgpack")
        if Path.cwd() == REPO else str(shipped / "lite_synface.msgpack")
    )


def test_save_allows_staging_paths(tmp_path):
    assert not train_detector.save_targets_shipped_dir(str(tmp_path / "w.msgpack"))
    assert not train_detector.save_targets_shipped_dir("checkpoints/staging/w.msgpack")


def test_default_weights_path_env_override(tmp_path, monkeypatch):
    from deepfake_vit_tpu.preprocessing.detector import default_weights_path

    cand = tmp_path / "cand.msgpack"
    cand.write_bytes(b"x")
    monkeypatch.setenv("DFV_WEIGHTS_LITE", str(cand))
    assert default_weights_path("lite") == str(cand)
    # An override pointing at a missing file yields None — never a silent
    # fall-through to the shipped path (that would unpick the gate).
    monkeypatch.setenv("DFV_WEIGHTS_LITE", str(tmp_path / "missing.msgpack"))
    assert default_weights_path("lite") is None


def test_family_tests_reference_real_nodes():
    for model, (nodes, shipped_name) in promote_weights.FAMILY_TESTS.items():
        assert shipped_name.endswith(".msgpack")
        for node in nodes:
            rel, func = node.split("::")
            path = REPO / rel
            assert path.exists(), node
            assert f"def {func}(" in path.read_text(), node


def test_promote_is_atomic_copy(tmp_path, monkeypatch):
    monkeypatch.setattr(promote_weights, "REPO", tmp_path)
    cand = tmp_path / "cand.msgpack"
    cand.write_bytes(b"accepted-weights")
    dest = promote_weights.promote(cand, "lite")
    assert dest == tmp_path / "deepfake_vit_tpu" / "weights" / "lite_synface.msgpack"
    assert dest.read_bytes() == b"accepted-weights"
    # No temp droppings left beside the destination.
    leftovers = [p for p in dest.parent.iterdir() if p != dest]
    assert leftovers == []


def test_trainer_cli_rejects_shipped_save(tmp_path):
    import os
    import subprocess

    # PALLAS_AXON_POOL_IPS must not reach the child: the sitecustomize
    # register() it triggers blocks interpreter start for minutes when the
    # TPU tunnel is wedged (CLAUDE.md round-3 lesson) — and this test only
    # exercises argparse, which runs before any jax import anyway.
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "train_detector.py"),
         "--synthetic", "1", "--model", "lite",
         "--save", str(REPO / "deepfake_vit_tpu" / "weights" / "evil.msgpack")],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert proc.returncode == 2
    assert "promote_weights" in proc.stderr
