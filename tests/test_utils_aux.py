"""Aux subsystems: visualization, profiling, param-group optimizer,
checkpoint io (reference parity: io_utils round trips, fine-tune LR groups,
viz API surface)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfake_vit_tpu.models import EfficientNetBackbone, frozen_stage_mask, param_group_labels
from deepfake_vit_tpu.preprocessing import PreprocessingOutput
from deepfake_vit_tpu.training.optim import create_optimizer_with_param_groups
from deepfake_vit_tpu.utils import (
    load_checkpoint,
    load_config,
    save_checkpoint,
    save_config,
    save_json,
    load_json,
    save_metrics,
)
from deepfake_vit_tpu.utils.profiling import StepTimer, device_sync
from deepfake_vit_tpu.utils.visualization import (
    plot_training_curves,
    visualize_attention_map,
    visualize_batch,
    visualize_detection,
    visualize_pipeline,
    visualize_quality,
)


def test_io_roundtrips(tmp_path):
    cfg = {"a": 1, "b": {"c": [1, 2, 3]}}
    save_config(cfg, tmp_path / "c.yaml")
    assert load_config(tmp_path / "c.yaml") == cfg
    save_json(cfg, tmp_path / "c.json")
    assert load_json(tmp_path / "c.json") == cfg
    save_metrics({"acc": 0.9}, tmp_path / "m.json")
    save_metrics({"acc": 0.95}, tmp_path / "m.json")
    records = load_json(tmp_path / "m.json")
    assert len(records) == 2 and records[1]["acc"] == 0.95


def test_checkpoint_rotation_and_best(tmp_path):
    for epoch in range(8):
        save_checkpoint(
            {"epoch": epoch, "params": {"w": np.full((2, 2), epoch, np.float32)}},
            tmp_path,
            is_best=(epoch == 3),
            max_keep=5,
        )
    ckpts = sorted(tmp_path.glob("checkpoint_epoch_*.ckpt"))
    assert len(ckpts) == 5  # rotation keeps newest 5
    assert (tmp_path / "best_model.ckpt").exists()
    best = load_checkpoint(tmp_path / "best_model.ckpt")
    assert best["epoch"] == 3
    np.testing.assert_array_equal(best["params"]["w"], np.full((2, 2), 3, np.float32))


def test_param_groups_and_freezing():
    model = EfficientNetBackbone(variant="b0")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = variables["params"]

    labels = param_group_labels(params)
    flat = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(labels)}
    assert any(v == "stem" for v in flat.values())
    assert any(v == "blocks" for v in flat.values())
    assert any(v == "head" for v in flat.values())

    mask = frozen_stage_mask(params, freeze_stages=2, variant="b0")
    mflat = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(mask)}
    assert not any(v for k, v in mflat.items() if "stem" in k)
    assert not any(v for k, v in mflat.items() if "block_0" in k)
    assert all(v for k, v in mflat.items() if "block_15" in k)

    tx = create_optimizer_with_param_groups(params, base_lr=1e-3, frozen_mask=mask)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    ups = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(updates)}
    frozen = [np.abs(v).max() for k, v in ups.items() if "block_0/" in k or "stem" in k]
    live = [np.abs(v).max() for k, v in ups.items() if "head_conv" in k]
    assert max(frozen) == 0.0
    assert min(live) > 0.0


def test_visualizations(rng, tmp_path):
    img = rng.integers(0, 255, (120, 140, 3), dtype=np.uint8)
    det = {
        "bbox": np.asarray([10, 10, 90, 100], np.float32),
        "landmarks": rng.uniform(20, 80, (5, 2)).astype(np.float32),
        "confidence": 0.87,
    }
    out = visualize_detection(img, det, save_path=tmp_path / "det.png")
    assert out.shape == img.shape and (tmp_path / "det.png").exists()

    q = {"is_valid": True, "overall_score": 0.8, "scores": {"blur": 150.0}}
    out = visualize_quality(img, q)
    assert out.shape == img.shape

    amap = visualize_attention_map(det["landmarks"], img, size=112)
    assert amap.shape == (112, 112, 3)

    po = PreprocessingOutput(
        aligned_face=rng.integers(0, 255, (224, 224, 3), dtype=np.uint8),
        landmarks=rng.uniform(0, 224, (5, 2)).astype(np.float32),
        original_landmarks=det["landmarks"],
        bbox=det["bbox"],
        confidence=0.9,
        success=True,
    )
    canvas = visualize_pipeline(img, po, save_path=tmp_path / "pipe.png")
    assert canvas.shape[0] == 224 and canvas.shape[1] == 672

    batch = rng.normal(0, 1, (6, 224, 224, 3)).astype(np.float32)
    grid = visualize_batch(batch, labels=[0, 1, 0, 1, 0, 1], predictions=[0, 1, 1, 1, 0, 0])
    assert grid.ndim == 3

    fig = plot_training_curves(
        {"train_loss": [1, 0.5], "val_loss": [1.1, 0.7], "train_acc": [0.5, 0.8],
         "val_acc": [0.5, 0.7], "val_auc": [0.5, 0.8], "val_f1": [0.4, 0.7],
         "lr": [1e-4, 5e-5]},
        save_path=tmp_path / "curves.png",
    )
    assert (tmp_path / "curves.png").exists()


def test_step_timer():
    timer = StepTimer()
    x = jnp.ones((8, 8))
    for _ in range(3):
        with timer.step(sync_on=x):
            _ = (x @ x).sum()
    stats = timer.stats(batch_size=8)
    assert stats["steps_timed"] == 3
    assert stats["samples_per_sec"] > 0
    device_sync(x)  # smoke


# ---------------------------------------------------------------------------
# TensorBoard event writer (utils/tb_writer.py)
# ---------------------------------------------------------------------------


def _read_tfrecords(path):
    """Parse TFRecord framing back, verifying both masked CRCs."""
    import struct

    from deepfake_vit_tpu.utils.tb_writer import _masked_crc

    records = []
    data = open(path, "rb").read()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (hcrc,) = struct.unpack_from("<I", data, off + 8)
        assert hcrc == _masked_crc(data[off:off + 8])
        payload = data[off + 12:off + 12 + length]
        (dcrc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert dcrc == _masked_crc(payload)
        records.append(payload)
        off += 16 + length
    return records


def _parse_scalars(payload):
    """Minimal proto walk: Event.summary(5).Value(1).{tag(1), simple_value(2)}."""
    import struct

    def varint(buf, i):
        shift = v = 0
        while True:
            b = buf[i]
            v |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                return v, i
            shift += 7

    out = {}
    i = 0
    while i < len(payload):
        key, i = varint(payload, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            _, i = varint(payload, i)
        elif wire == 1:
            i += 8
        elif wire == 5:
            i += 4
        elif wire == 2:
            ln, i = varint(payload, i)
            chunk = payload[i:i + ln]
            i += ln
            if field == 5:  # summary → values
                j = 0
                while j < len(chunk):
                    k2, j = varint(chunk, j)
                    ln2, j = varint(chunk, j)
                    val = chunk[j:j + ln2]
                    j += ln2
                    tag, sv = None, None
                    m = 0
                    while m < len(val):
                        k3, m = varint(val, m)
                        f3, w3 = k3 >> 3, k3 & 7
                        if w3 == 2:
                            l3, m = varint(val, m)
                            if f3 == 1:
                                tag = val[m:m + l3].decode()
                            m += l3
                        elif w3 == 5:
                            if f3 == 2:
                                (sv,) = struct.unpack_from("<f", val, m)
                            m += 4
                        elif w3 == 0:
                            _, m = varint(val, m)
                        else:
                            m += 8
                    if tag is not None:
                        out[tag] = sv
    return out


def test_tb_writer_roundtrip(tmp_path):
    import numpy as np

    from deepfake_vit_tpu.utils.tb_writer import SummaryWriter

    with SummaryWriter(tmp_path / "tb") as w:
        w.add_scalar("train/loss", 0.75, step=1)
        w.add_scalars({"val/auc": 0.9, "val/acc": 0.8125}, step=2)
        path = w.path

    assert path.name.startswith("events.out.tfevents.")
    records = _read_tfrecords(path)
    assert len(records) == 3  # file-version event + 2 scalar events
    s1 = _parse_scalars(records[1])
    s2 = _parse_scalars(records[2])
    np.testing.assert_allclose(s1["train/loss"], 0.75, rtol=1e-6)
    np.testing.assert_allclose(s2["val/auc"], 0.9, rtol=1e-6)
    np.testing.assert_allclose(s2["val/acc"], 0.8125, rtol=1e-6)
