#!/usr/bin/env python
"""Per-stage profile of the headline e2e pipeline (serving 640² / det 320²).

Times each stage of FusedPipeline._graph as its own jitted program at the
headline batch so the round-3 perf levers target the real cost centers.
Also sweeps classify-only batch sizes (VERDICT round-2 item 1b).

Numbers go to stderr; a JSON summary to stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jax.device_get([l.ravel()[0] for l in leaves if hasattr(l, "ravel")])


def _time_fn(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from deepfake_vit_tpu.e2e import FusedPipeline
    from deepfake_vit_tpu.ops.anchors import STRIDES
    from deepfake_vit_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD
    from deepfake_vit_tpu.ops.quality import overall_quality
    from deepfake_vit_tpu.ops.umeyama import transform_points, umeyama
    from deepfake_vit_tpu.ops.warp import _avg_pool2, warp_affine_windowed
    from deepfake_vit_tpu.utils import enable_compilation_cache, load_config, get_project_root

    enable_compilation_cache()
    cfg_dir = get_project_root() / "deepfake_vit_tpu" / "configs"
    model_config = load_config(cfg_dir / "model_config.yaml")

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    serving = (640, 640)
    det_size = (320, 320)
    pipe = FusedPipeline(model_config, detection_input_size=det_size,
                         serving_size=serving, confidence_threshold=0.0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        det_vars, model_vars = pipe.load_variables(jax.random.PRNGKey(0))
    det_vars, model_vars = jax.device_put((det_vars, model_vars), jax.devices()[0])
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, size=(batch, *serving, 3)), jnp.float32)

    results = {}

    def report(name, t, n=batch):
        results[name] = round(t * 1e3, 3)
        print(f"{name}: {t*1e3:.2f} ms ({n/t:.0f}/s)", file=sys.stderr)

    # stage 0: pool 640->320
    pool = jax.jit(lambda f: _avg_pool2(f))
    t = _time_fn(pool, frames)
    report("pool_640_to_320", t)
    det_frames = pool(frames)

    # stage 1: detector fwd + decode + best-face select
    def detect(dv, df):
        x = (df - 127.5) / 128.0
        outs = pipe.detector.apply(dv, x, train=False)
        scores = jnp.concatenate([jax.nn.sigmoid(outs[s]["scores"]) for s in STRIDES], axis=1)
        dist = jnp.concatenate([outs[s]["bbox"] for s in STRIDES], axis=1)
        kps = jnp.concatenate([outs[s]["kps"] for s in STRIDES], axis=1)
        from deepfake_vit_tpu.ops.anchors import decode_boxes, decode_landmarks
        best = jnp.argmax(scores, axis=1)
        conf = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
        boxes = decode_boxes(pipe._centers, pipe._strides, dist)
        landmarks = decode_landmarks(pipe._centers, pipe._strides, kps)
        bbox = jnp.take_along_axis(boxes, best[:, None, None], axis=1)[:, 0]
        lms = jnp.take_along_axis(landmarks, best[:, None, None, None], axis=1)[:, 0]
        return conf, bbox, lms

    detect_j = jax.jit(detect)
    t = _time_fn(detect_j, det_vars, det_frames)
    report("detect_320", t)
    conf, bbox, lms = detect_j(det_vars, det_frames)

    # stage 1b: same detect with the int8 graph (models/scrfd_int8.py),
    # static calibrated scales — isolates the s8-conv gain from the e2e A/B.
    from deepfake_vit_tpu.models.scrfd_int8 import (
        ScrfdInt8Runner, calibrate_det_act_scales,
    )

    det_norm = (det_frames - 127.5) / 128.0
    with jax.default_device(cpu):
        det_scales = calibrate_det_act_scales(
            jax.device_get(det_vars), [np.asarray(det_norm[:8], np.float32)]
        )

    def detect_int8(dv, df):
        # Identical decode+select tail to `detect`; only the network differs.
        x = (df - 127.5) / 128.0
        outs = ScrfdInt8Runner(dv, act_scales=det_scales)(x)
        scores = jnp.concatenate([jax.nn.sigmoid(outs[s]["scores"]) for s in STRIDES], axis=1)
        dist = jnp.concatenate([outs[s]["bbox"] for s in STRIDES], axis=1)
        kps = jnp.concatenate([outs[s]["kps"] for s in STRIDES], axis=1)
        from deepfake_vit_tpu.ops.anchors import decode_boxes, decode_landmarks
        best = jnp.argmax(scores, axis=1)
        conf = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
        boxes = decode_boxes(pipe._centers, pipe._strides, dist)
        landmarks = decode_landmarks(pipe._centers, pipe._strides, kps)
        bbox = jnp.take_along_axis(boxes, best[:, None, None], axis=1)[:, 0]
        lms = jnp.take_along_axis(landmarks, best[:, None, None, None], axis=1)[:, 0]
        return conf, bbox, lms

    try:
        t = _time_fn(jax.jit(detect_int8), det_vars, det_frames)
        report("detect_320_int8", t)
    except Exception as e:  # s8 convs may not lower on every backend
        print(f"detect_320_int8: failed ({type(e).__name__}: {e})", file=sys.stderr)
    lms_s = lms * 2 + 0.5

    # stage 2: umeyama + windowed warp from 640²
    def align(fr, l):
        ref = jnp.broadcast_to(pipe.reference, l.shape)
        tform = umeyama(l, ref)
        aligned = warp_affine_windowed(fr, tform, pipe.output_size, window=pipe.warp_window)
        return aligned, transform_points(tform, l)

    align_j = jax.jit(align)
    t = _time_fn(align_j, frames, lms_s)
    report("align_warp_640", t)
    aligned, aligned_lms = align_j(frames, lms_s)

    # stage 3: quality
    qual_j = jax.jit(lambda a, al, bb, c: overall_quality(a, al, bb, c))
    t = _time_fn(qual_j, aligned, aligned_lms, bbox, conf)
    report("quality", t)

    # stage 4: classify at the headline batch
    def classify(mv, a, al):
        norm = (a / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        logits, features = pipe.model.apply(mv, norm, al, train=False, return_features=True)
        return jax.nn.softmax(logits, axis=-1)

    classify_j = jax.jit(classify)
    t = _time_fn(classify_j, model_vars, aligned, aligned_lms)
    report("classify_b%d" % batch, t)

    # whole fused graph for comparison
    t = _time_fn(pipe.forward, det_vars, model_vars, frames)
    report("e2e_fused", t)

    # classify batch sweep (fresh arrays; b256 vs b128 vs b64)
    if "--sweep" in sys.argv:
        for b in (64, 128, 256):
            imgs = jnp.asarray(rng.uniform(0, 255, (b, 224, 224, 3)), jnp.float32)
            lm = jnp.asarray(rng.uniform(0, 224, (b, 5, 2)), jnp.float32)
            t = _time_fn(classify_j, model_vars, imgs, lm)
            report(f"classify_sweep_b{b}", t, n=b)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
