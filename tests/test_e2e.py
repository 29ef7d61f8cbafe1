"""Fused end-to-end pipeline tests on the 8-device virtual mesh
(BASELINE configs 2/4/5: single-image full pipeline, clip aggregation,
sharded multi-dataset batch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfake_vit_tpu.e2e import FusedPipeline
from deepfake_vit_tpu.parallel import data_parallel_mesh, shard_batch


@pytest.fixture(scope="module")
def pipe():
    model_cfg = {
        "model": {
            "feature_extractor": {"variant": "b0", "dropout_rate": 0.2},
            "classifier": {"hidden_dims": [16], "num_classes": 2},
        }
    }
    return FusedPipeline(
        model_cfg["model"] and model_cfg,
        detection_input_size=(128, 128),
        output_size=(64, 64),
        confidence_threshold=0.0,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def variables(pipe):
    return pipe.init_variables(jax.random.PRNGKey(0))


def test_fused_forward_contract(pipe, variables, rng):
    det_vars, model_vars = variables
    frames = jnp.asarray(rng.uniform(0, 255, (4, 128, 128, 3)), jnp.float32)
    out = jax.device_get(pipe.forward(det_vars, model_vars, frames))
    assert out["probs"].shape == (4, 2)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, rtol=1e-4)
    assert out["bbox"].shape == (4, 4)
    assert out["landmarks"].shape == (4, 5, 2)
    assert out["quality"].shape == (4,)
    assert np.all((out["quality"] >= 0) & (out["quality"] <= 1))
    assert out["features"].shape == (4, 1280)
    assert out["fake_prob"].shape == (4,)


def test_clip_aggregation(pipe, variables, rng):
    det_vars, model_vars = variables
    frames = rng.uniform(0, 255, (5, 128, 128, 3)).astype(np.float32)
    result = pipe.predict_clip(det_vars, model_vars, frames)
    assert result["label"] in (0, 1)
    assert 0.0 <= result["fake_prob"] <= 1.0
    assert len(result["frame_probs"]) == 5
    # mean semantics: label == (mean fake prob >= 0.5) when faces found
    if result["num_faces"] > 0:
        probs = [p for p, m in zip(result["frame_probs"], range(5))]
        assert result["label"] == int(result["fake_prob"] >= 0.5)


def test_sharded_pipeline(pipe, variables, rng):
    mesh = data_parallel_mesh()
    det_vars, model_vars = variables
    fwd = pipe.make_sharded(mesh)
    frames_host = rng.uniform(0, 255, (16, 128, 128, 3)).astype(np.float32)
    frames = shard_batch({"x": frames_host}, mesh)["x"]
    out = fwd(det_vars, model_vars, frames)
    assert len(out["probs"].sharding.device_set) == 8
    # Sharded result == single-device result
    ref = pipe.forward(det_vars, model_vars, jnp.asarray(frames_host))
    np.testing.assert_allclose(
        np.asarray(out["fake_prob"]), np.asarray(ref["fake_prob"]), atol=2e-3
    )


def test_video_clip_frame_axis_mesh(pipe, variables, rng):
    """Video scaling contract (SURVEY §5): the frame axis is a named mesh
    dimension — clips shard over 'data', frames over 'frame', and the
    clip-level mean crosses the frame axis via an XLA-inserted collective."""
    from deepfake_vit_tpu.parallel import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(("data", "frame"), (4, 2))
    det_vars, model_vars = variables

    C, F = 4, 4  # 4 clips × 4 frames
    clips_host = rng.uniform(0, 255, (C, F, 128, 128, 3)).astype(np.float32)

    def clip_graph(det_vars, model_vars, clips):
        flat = clips.reshape(C * F, *clips.shape[2:])
        out = pipe._graph(det_vars, model_vars, flat)
        fake = out["fake_prob"].reshape(C, F)
        has = out["has_face"].reshape(C, F).astype(jnp.float32)
        mean_fake = jnp.sum(fake * has, axis=1) / jnp.maximum(jnp.sum(has, axis=1), 1.0)
        return mean_fake  # (C,) — reduction over the frame-sharded axis

    repl = NamedSharding(mesh, P())
    clip_sh = NamedSharding(mesh, P("data", "frame"))
    fwd = jax.jit(
        clip_graph,
        in_shardings=(repl, repl, clip_sh),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    clips = jax.device_put(clips_host, clip_sh)
    out = fwd(det_vars, model_vars, clips)
    assert out.shape == (C,)
    # Equivalence with the unsharded computation
    ref = clip_graph(det_vars, model_vars, jnp.asarray(clips_host))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_serving_size_decoupled_from_detection(rng):
    """serving_size frames: detector runs on the pooled canvas, alignment
    warps from original-resolution pixels, coords reported in serving px."""
    model_cfg = {
        "model": {
            "feature_extractor": {"variant": "b0", "dropout_rate": 0.2},
            "classifier": {"hidden_dims": [16], "num_classes": 2},
        }
    }
    pipe = FusedPipeline(
        model_cfg,
        detection_input_size=(128, 128),
        serving_size=(256, 256),
        output_size=(64, 64),
        warp_window=160,
        confidence_threshold=0.0,
        dtype=jnp.float32,
    )
    det_vars, model_vars = pipe.init_variables(jax.random.PRNGKey(0))
    frames = jnp.asarray(rng.uniform(0, 255, (4, 256, 256, 3)), jnp.float32)
    out = jax.device_get(pipe.forward(det_vars, model_vars, frames))
    assert out["probs"].shape == (4, 2)
    assert out["bbox"].shape == (4, 4)
    # bbox in serving coords: decode clamps to the canvas, so scaled boxes
    # may reach the serving extent but not beyond
    assert np.all(out["bbox"] <= 256.5) and np.all(out["bbox"] >= -0.5)

    def test_bad_ratio():
        FusedPipeline(model_cfg, detection_input_size=(128, 128), serving_size=(384, 384))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        test_bad_ratio()


def test_multi_face_serving_keep_top_k(rng):
    """keep_top_k > 1 (reference preprocessing_config.yaml:9): outputs gain
    a faces axis with a validity mask; face 0 must agree with the K=1
    best-face path; the K=1 contract is unchanged elsewhere."""
    model_cfg = {
        "model": {
            "feature_extractor": {"variant": "b0", "dropout_rate": 0.2},
            "classifier": {"hidden_dims": [16], "num_classes": 2},
        }
    }
    common = dict(
        detection_input_size=(128, 128), output_size=(64, 64),
        confidence_threshold=0.0, dtype=jnp.float32,
    )
    pipe1 = FusedPipeline(model_cfg, **common)
    pipeK = FusedPipeline(model_cfg, keep_top_k=3, **common)
    det_vars, model_vars = pipe1.init_variables(jax.random.PRNGKey(0))

    frames = jnp.asarray(rng.uniform(0, 255, (4, 128, 128, 3)), jnp.float32)
    out1 = jax.device_get(pipe1.forward(det_vars, model_vars, frames))
    outK = jax.device_get(pipeK.forward(det_vars, model_vars, frames))

    assert outK["probs"].shape == (4, 3, 2)
    assert outK["face_valid"].shape == (4, 3)
    assert outK["bbox"].shape == (4, 3, 4)
    assert outK["landmarks"].shape == (4, 3, 5, 2)
    # Face 0 == the K=1 best face (NMS picks highest score first).
    np.testing.assert_allclose(
        outK["confidence"][:, 0], out1["confidence"], atol=1e-5
    )
    np.testing.assert_allclose(outK["bbox"][:, 0], out1["bbox"], atol=1e-3)
    # Invalid faces carry fake_prob 0.
    fp = outK["fake_prob"]
    assert np.all(fp[~outK["face_valid"]] == 0.0)
    # NMS semantics: valid faces within a frame don't heavily overlap.
    from deepfake_vit_tpu.ops.nms import iou_matrix
    for b in range(4):
        vb = outK["face_valid"][b]
        if vb.sum() >= 2:
            ious = np.asarray(iou_matrix(
                jnp.asarray(outK["bbox"][b]), jnp.asarray(outK["bbox"][b])
            ))
            off = ious[np.triu_indices(3, 1)]
            vv = np.outer(vb, vb)[np.triu_indices(3, 1)]
            assert np.all(off[vv] <= 0.4 + 1e-4)


def test_stem_pool_fold_exact(rng):
    """pool(2×) → detector == folded k6-s4 stem on full-res frames, with
    weights expanded by fold_stem_pool_params — exact to accumulation
    order (models/scrfd.py)."""
    from deepfake_vit_tpu.models.scrfd import ScrfdDetector, fold_stem_pool_params
    from deepfake_vit_tpu.ops.warp import _avg_pool2

    det = ScrfdDetector(dtype=jnp.float32)
    det_folded = ScrfdDetector(dtype=jnp.float32, stem_pool=2)
    frames = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)), jnp.float32)
    pooled = _avg_pool2(frames)
    v = det.init(jax.random.PRNGKey(0), pooled)
    ref = det.apply(v, pooled, train=False)
    out = det_folded.apply(fold_stem_pool_params(v, 2), frames, train=False)
    for s in ref:
        for k in ref[s]:
            np.testing.assert_allclose(
                np.asarray(out[s][k]), np.asarray(ref[s][k]), atol=2e-4
            )


def test_quality_off_and_int8_start_knobs(pipe, variables, rng):
    """compute_quality=False keeps the output contract (quality == 1,
    valid) with identical probs; int8_tail_start overrides the tail split
    (exercised on the b0 graph — the parity gate lives in
    tests/test_int8_tail.py)."""
    det_vars, model_vars = variables
    frames = jnp.asarray(rng.uniform(0, 255, (2, 128, 128, 3)), jnp.float32)
    ref = jax.device_get(pipe.forward(det_vars, model_vars, frames))

    model_cfg = {
        "model": {
            "feature_extractor": {"variant": "b0", "dropout_rate": 0.2},
            "classifier": {"hidden_dims": [16], "num_classes": 2},
        }
    }
    noq = FusedPipeline(
        model_cfg, detection_input_size=(128, 128), output_size=(64, 64),
        confidence_threshold=0.0, dtype=jnp.float32, compute_quality=False,
    )
    out = jax.device_get(noq.forward(det_vars, model_vars, frames))
    np.testing.assert_array_equal(out["quality"], 1.0)
    assert out["quality_valid"].all()
    np.testing.assert_allclose(out["probs"], ref["probs"], atol=1e-5)

    from deepfake_vit_tpu.models.int8_tail import default_tail_start

    start = default_tail_start("b0") - 2
    early = FusedPipeline(
        model_cfg, detection_input_size=(128, 128), output_size=(64, 64),
        confidence_threshold=0.0, dtype=jnp.float32,
        use_int8_tail=True, int8_tail_start=start,
    )
    out8 = jax.device_get(early.forward(det_vars, model_vars, frames))
    assert out8["probs"].shape == (2, 2)
    assert np.abs(out8["probs"] - ref["probs"]).max() < 0.05


def test_warp_fractional_serving(rng):
    """warp_fractional=True routes alignment through the fractional
    windowed crop (ops/warp.py::window_geometry_frac) end to end; outputs
    stay finite/contract-shaped and close to the block-average path (both
    approximate the same exact warp)."""
    model_cfg = {
        "model": {
            "feature_extractor": {"variant": "b0", "dropout_rate": 0.0},
            "classifier": {"hidden_dims": [16], "num_classes": 2},
        }
    }
    common = dict(
        detection_input_size=(128, 128),
        serving_size=(256, 256),
        output_size=(64, 64),
        warp_window=160,
        confidence_threshold=0.0,
        dtype=jnp.float32,
    )
    pipe_b = FusedPipeline(model_cfg, **common)
    pipe_f = FusedPipeline(model_cfg, warp_fractional=True, **common)
    det_vars, model_vars = pipe_b.init_variables(jax.random.PRNGKey(0))
    frames = jnp.asarray(rng.uniform(0, 255, (4, 256, 256, 3)), jnp.float32)
    out_b = jax.device_get(pipe_b.forward(det_vars, model_vars, frames))
    out_f = jax.device_get(pipe_f.forward(det_vars, model_vars, frames))
    assert out_f["probs"].shape == (4, 2)
    assert np.all(np.isfinite(out_f["probs"]))
    # same detections, near-identical probabilities (crops differ only by
    # resample taps for faces larger than the window)
    np.testing.assert_allclose(out_f["bbox"], out_b["bbox"], atol=1e-3)
    assert np.abs(out_f["probs"] - out_b["probs"]).max() < 0.2


def test_multi_face_fractional_frame_indices(rng):
    """keep_top_k > 1 with serving > window routes K faces per frame
    through the fractional windowed crop via frame_indices (shared frame
    pixels, no replication); contract and finiteness hold."""
    model_cfg = {
        "model": {
            "feature_extractor": {"variant": "b0", "dropout_rate": 0.0},
            "classifier": {"hidden_dims": [16], "num_classes": 2},
        }
    }
    pipe = FusedPipeline(
        model_cfg, detection_input_size=(128, 128), serving_size=(256, 256),
        output_size=(64, 64), warp_window=160, keep_top_k=3,
        confidence_threshold=0.0, warp_fractional=True, dtype=jnp.float32,
    )
    det_vars, model_vars = pipe.init_variables(jax.random.PRNGKey(0))
    frames = jnp.asarray(rng.uniform(0, 255, (3, 256, 256, 3)), jnp.float32)
    out = jax.device_get(pipe.forward(det_vars, model_vars, frames))
    assert out["probs"].shape == (3, 3, 2)
    assert np.all(np.isfinite(out["probs"]))
    assert out["face_valid"].shape == (3, 3)


@pytest.mark.slow
@pytest.mark.parametrize("frac,taps", [
    (False, "uw16"), (False, "int8"), (True, "uw16"), (True, "int8"),
])
def test_serving_combo_pallas_interpret(rng, monkeypatch, frac, taps):
    """The on-chip sweep's tap-mode combos (probe_serving --sweep), composed
    through the FULL FusedPipeline with the pallas windowed-warp path forced
    (interpret mode) — the kernels are unit-parity-tested in
    tests/test_pallas_warp.py, but only this composition exercises the
    serving dtype chain (uint8 frames -> bf16 crops -> tap-mode warp) the
    tunnel would otherwise compile blind."""
    from functools import partial

    from jax.experimental.pallas import tpu as pltpu

    import deepfake_vit_tpu.e2e as e2e_mod
    from deepfake_vit_tpu.ops.warp import warp_affine_windowed

    model_cfg = {
        "model": {
            "feature_extractor": {"variant": "b0", "dropout_rate": 0.0},
            "classifier": {"hidden_dims": [16], "num_classes": 2},
        }
    }
    common = dict(
        detection_input_size=(128, 128),
        serving_size=(256, 256),
        output_size=(64, 64),
        warp_window=160,
        confidence_threshold=0.0,
        dtype=jnp.float32,
        warp_fractional=frac,
    )
    frames = jnp.asarray(rng.uniform(0, 255, (3, 256, 256, 3)), jnp.float32)

    ref_pipe = FusedPipeline(model_cfg, **common)  # XLA fallback warp
    det_vars, model_vars = ref_pipe.init_variables(jax.random.PRNGKey(0))
    ref = jax.device_get(ref_pipe.forward(det_vars, model_vars, frames))

    monkeypatch.setattr(
        e2e_mod, "warp_affine_windowed",
        partial(warp_affine_windowed, use_pallas=True),
    )
    pipe = FusedPipeline(model_cfg, warp_tap_mode=taps, **common)
    with pltpu.force_tpu_interpret_mode():
        out = jax.device_get(pipe.forward(det_vars, model_vars, frames))

    # Detection precedes the warp: identical. Classify sees bf16-kernel
    # crops instead of the f32 XLA warp: near-identical probabilities.
    np.testing.assert_allclose(out["bbox"], ref["bbox"], atol=1e-3)
    assert np.all(np.isfinite(out["probs"]))
    assert np.abs(out["probs"] - ref["probs"]).max() < 0.1
