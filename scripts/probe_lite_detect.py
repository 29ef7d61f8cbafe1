#!/usr/bin/env python
"""One-off isolated detect-stage timing: S2D-Lite vs SCRFD @320², headline batch.

Quantifies the e2e loss measured in the round-4 `128f+L` sweep (BASELINE.md):
times ONLY the detector forward (+ decode/best-face select) for both families
under identical inputs, so the post-mortem states where the +3.4 ms e2e gap
lives. Reference contract being probed: the production detector swap point of
/root/reference/src/preprocessing/face_detector.py:280-299 (factory families).
"""

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
    from deepfake_vit_tpu.ops.anchors import STRIDES, decode_boxes, decode_landmarks
    from deepfake_vit_tpu.utils import enable_compilation_cache, load_config, get_project_root

    enable_compilation_cache()
    cfg_dir = get_project_root() / "deepfake_vit_tpu" / "configs"
    model_config = load_config(cfg_dir / "model_config.yaml")
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    cpu = jax.devices("cpu")[0]
    # Device-side synthesis: a b256 f32 host batch is ~314 MB — minutes over
    # the tunnel. Content doesn't affect timing; only shapes/dtypes do.
    det_frames = jax.jit(
        lambda k: jax.random.uniform(k, (batch, 320, 320, 3), jnp.float32, 0.0, 255.0)
    )(jax.random.PRNGKey(0))

    for arch in ("scrfd", "lite"):
        pipe = FusedPipeline(model_config, detection_input_size=(320, 320),
                             serving_size=(640, 640), confidence_threshold=0.0,
                             detector_arch=arch)
        with jax.default_device(cpu):
            det_vars, _ = pipe.load_variables(jax.random.PRNGKey(0))
        det_vars = jax.device_put(det_vars, jax.devices()[0])

        def detect(dv, df, pipe=pipe):
            x = (df - 127.5) / 128.0
            outs = pipe.detector.apply(dv, x, train=False)
            scores = jnp.concatenate([jax.nn.sigmoid(outs[s]["scores"]) for s in STRIDES], axis=1)
            dist = jnp.concatenate([outs[s]["bbox"] for s in STRIDES], axis=1)
            kps = jnp.concatenate([outs[s]["kps"] for s in STRIDES], axis=1)
            best = jnp.argmax(scores, axis=1)
            conf = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
            boxes = decode_boxes(pipe._centers, pipe._strides, dist)
            landmarks = decode_landmarks(pipe._centers, pipe._strides, kps)
            bbox = jnp.take_along_axis(boxes, best[:, None, None], axis=1)[:, 0]
            lms = jnp.take_along_axis(landmarks, best[:, None, None, None], axis=1)[:, 0]
            return conf, bbox, lms

        t = _time_fn(jax.jit(detect), det_vars, det_frames)
        n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(det_vars))
        print(f"{arch}: {t*1e3:.2f} ms @ b{batch} ({n_params/1e6:.2f}M params)")


if __name__ == "__main__":
    main()
