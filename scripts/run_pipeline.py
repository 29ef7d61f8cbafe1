#!/usr/bin/env python
"""High-throughput batch serving driver.

BASELINE configs 4/5: stream a directory of images and videos through the
fused single-program pipeline (detect→align→quality→classify) in fixed-size
frame batches, aggregate per file (mean fake-probability over frames with
faces, threshold 0.5, failure→real — the reference's clip semantics), and
report faces/sec throughput. Host decode runs in a thread pool overlapped
with device compute; batches can shard across a mesh.

This is the serving-path counterpart of scripts/predict.py (which optimizes
per-file latency; this optimizes throughput across many files).
"""

import argparse
import csv
import queue
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}
VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm"}


def frame_producer(jobs, frame_count, serving_size, out_queue, stop):
    """Decode files → (file_idx, uint8 RGB frame letterboxed at SERVING size).

    uint8 canvases keep H2D transfers 4× smaller than float32; the fused
    graph casts on device. ``jobs`` is [(file_idx, path)] — one producer
    handles a file completely (videos stay within one thread)."""
    import cv2

    H, W = serving_size

    def fit(rgb):
        h, w = rgb.shape[:2]
        scale = min(W / w, H / h)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        resized = cv2.resize(rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((H, W, 3), np.uint8)
        canvas[:nh, :nw] = resized
        return canvas, scale

    for idx, path in jobs:
        if stop.is_set():
            break
        suffix = path.suffix.lower()
        try:
            if suffix in IMAGE_EXTS:
                bgr = cv2.imread(str(path))
                if bgr is None:
                    continue
                frame, _ = fit(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
                out_queue.put((idx, frame))
            elif suffix in VIDEO_EXTS:
                cap = cv2.VideoCapture(str(path))
                total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
                indices = np.linspace(0, max(total - 1, 0), min(frame_count, max(total, 1))).astype(int)
                for fi in indices:
                    cap.set(cv2.CAP_PROP_POS_FRAMES, int(fi))
                    ok, bgr = cap.read()
                    if ok:
                        frame, _ = fit(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
                        out_queue.put((idx, frame))
                cap.release()
        except Exception:
            continue
    out_queue.put(None)


def main():
    parser = argparse.ArgumentParser(description="Batch serving over the fused pipeline")
    parser.add_argument("--data-dir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default=None, help="classifier .ckpt")
    parser.add_argument(
        "--detector-weights", type=str, default="default",
        help="'default' = committed trained weights; 'none' = random init; or a path",
    )
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--output", type=str, default="predictions.csv")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--det-size", type=int, default=320)
    parser.add_argument(
        "--serving-size", type=int, default=None,
        help="frame resolution (power-of-2 multiple of --det-size; default = "
             "--det-size). Detection runs on the pooled --det-size canvas; "
             "alignment warps from the original serving-resolution pixels "
             "(the headline 640/320 config: --serving-size 640 --det-size 320)",
    )
    parser.add_argument("--workers", type=int, default=4,
                        help="decode threads feeding the device")
    parser.add_argument("--frames", type=int, default=5)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--confidence", type=float, default=0.5)
    parser.add_argument("--int8", action="store_true",
                        help="serve with the parity-gated int8 late-stage tail")
    parser.add_argument("--int8-static", action="store_true",
                        help="with --int8: calibrated static activation scales "
                        "from the stage-3 split (the measured serving optimum, "
                        "BASELINE.md) — calibrates at startup on rendered faces")
    parser.add_argument("--int8-calib-faces", type=str, default=None,
                        help="optional .npy of (N, 224, 224, 3) RGB [0,255] "
                        "faces for --int8-static calibration (default: a "
                        "procedurally rendered face batch)")
    parser.add_argument("--warp-window", type=int, default=160,
                        help="windowed-warp window (128 = measured fast knob)")
    parser.add_argument("--warp-fractional", action="store_true",
                        help="fractional-scale windowed crop: per-face bilinear "
                        "resample instead of the 2^l block average — lower crop "
                        "RMSE in every face-size bin (BASELINE.md)")
    parser.add_argument("--warp-taps", type=str, default="legacy",
                        choices=["legacy", "uw", "uw16", "int8"],
                        help="warp-kernel tap construction "
                        "(ops/pallas/warp_kernel.py; rank-2 MXU modes)")
    parser.add_argument("--int8-detector", action="store_true",
                        help="serve the SCRFD forward as s8×s8→s32 MXU convs "
                        "with static calibrated scales (models/scrfd_int8.py, "
                        "parity-gated in tests/test_scrfd_int8.py)")
    parser.add_argument("--detector-arch", type=str, default="scrfd",
                        choices=["scrfd", "lite"],
                        help="detection family: scrfd (production) or lite "
                        "(S2D-Lite, models/lite_detector.py — space-to-depth "
                        "ultra-light net; loads its own committed weights)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from deepfake_vit_tpu.e2e import FusedPipeline
    from deepfake_vit_tpu.parallel import data_parallel_mesh
    from deepfake_vit_tpu.utils import enable_compilation_cache, load_config, setup_logger

    enable_compilation_cache()
    logger = setup_logger("run_pipeline")

    cfg_dir = Path(__file__).resolve().parents[1] / "deepfake_vit_tpu" / "configs"
    model_config = load_config(args.config or cfg_dir / "model_config.yaml")

    det_size = (args.det_size, args.det_size)
    serving = args.serving_size or args.det_size
    serving_size = (serving, serving)
    pipe = FusedPipeline(
        model_config,
        detection_input_size=det_size,
        serving_size=serving_size,
        confidence_threshold=args.confidence,
        use_int8_tail=args.int8,
        int8_tail_start=10 if args.int8_static else None,
        warp_window=args.warp_window,
        warp_fractional=args.warp_fractional,
        warp_tap_mode=args.warp_taps,
        use_int8_detector=args.int8_detector,
        detector_arch=args.detector_arch,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        det_vars, model_vars = pipe.load_variables(
            jax.random.PRNGKey(0),
            classifier_checkpoint=args.checkpoint,
            detector_weights=None if args.detector_weights == "none" else args.detector_weights,
        )
        if args.int8 and args.int8_static:
            import numpy as _np2

            if args.int8_calib_faces:
                faces = _np2.load(args.int8_calib_faces)
            else:
                from deepfake_vit_tpu.data.synth_faces import render_labeled_face

                _rng = _np2.random.default_rng(0)
                faces = _np2.stack([
                    render_labeled_face(_rng, size=pipe.output_size[0])[0]
                    for _ in range(8)
                ])
            logger.info("calibrating static int8 scales (CPU backend)")
            pipe.calibrate_int8(model_vars, faces, batch_size=8)
        if args.int8_detector:
            import numpy as _np3

            from deepfake_vit_tpu.data.synth_faces import render_scene

            logger.info("calibrating static int8 DETECTOR scales (CPU backend)")
            _rng3 = _np3.random.default_rng(2)
            cal_frames = _np3.stack([
                render_scene(_rng3, size=serving, max_faces=2, p_empty=0.0)[0]
                for _ in range(4)
            ]).astype(_np3.float32)
            pipe.calibrate_int8_detector(det_vars, cal_frames)
    det_vars, model_vars = jax.device_put((det_vars, model_vars), jax.devices()[0])

    mesh = data_parallel_mesh()
    forward = pipe.make_sharded(mesh)

    # Warm the executable AND the uint8 host→device transfer path before
    # the clock starts: the first call compiles (minutes over the TPU
    # tunnel; persistent-cached afterwards), and this tunnel's FIRST uint8
    # H2D in a process runs ~600× slower than steady state (measured
    # 0.05 MB/s vs ~30 MB/s) — jnp.zeros creates device-side and would NOT
    # warm it, so push a real host buffer through once.
    import numpy as _np

    warm = jax.device_put(
        _np.zeros((args.batch_size, *serving_size, 3), _np.uint8)
    )
    jax.device_get(
        jax.tree_util.tree_leaves(forward(det_vars, model_vars, warm))[0].ravel()[0]
    )
    del warm

    files = sorted(
        p for p in Path(args.data_dir).iterdir()
        if p.suffix.lower() in IMAGE_EXTS | VIDEO_EXTS
    )
    logger.info(
        f"{len(files)} files; batch {args.batch_size}; serving {serving_size}; "
        f"det {det_size}; {args.workers} decode workers"
    )

    q: "queue.Queue" = queue.Queue(maxsize=args.batch_size * 3)
    stop = threading.Event()
    n_workers = max(1, args.workers)
    jobs = list(enumerate(files))
    producers = [
        threading.Thread(
            target=frame_producer,
            args=(jobs[w::n_workers], args.frames, serving_size, q, stop),
            daemon=True,
        )
        for w in range(n_workers)
    ]
    for t in producers:
        t.start()

    sums = np.zeros(len(files))
    counts = np.zeros(len(files))
    buf_frames, buf_idx = [], []
    n_frames = 0
    pending = None  # (device outputs, frame→file indices, n_valid)
    t0 = time.perf_counter()

    def drain(p):
        """Pull a completed batch's results to the host and accumulate."""
        nonlocal n_frames
        out_dev, idxs, n = p
        out = jax.device_get(out_dev)
        has = out["has_face"][:n]
        fake = out["fake_prob"][:n]
        for k in range(n):
            if has[k]:
                sums[idxs[k]] += float(fake[k])
                counts[idxs[k]] += 1
        n_frames += n

    def flush():
        """Submit the buffered batch (async dispatch) and drain the PREVIOUS
        one — one batch is always in flight, so host decode + accumulation
        overlap device compute (ROADMAP serving-overlap item; on the axon
        runtime only device_get synchronizes, dispatch returns immediately)."""
        nonlocal buf_frames, buf_idx, pending
        if not buf_frames:
            return
        n = len(buf_frames)
        pad = args.batch_size - n
        frames = np.stack(buf_frames)
        if pad:
            frames = np.concatenate(
                [frames, np.zeros((pad, *serving_size, 3), np.uint8)]
            )
        out_dev = forward(det_vars, model_vars, jnp.asarray(frames))
        prev, pending = pending, (out_dev, buf_idx, n)
        buf_frames, buf_idx = [], []
        if prev is not None:
            drain(prev)

    done_producers = 0
    while True:
        item = q.get()
        if item is None:
            done_producers += 1
            if done_producers == n_workers:
                break
            continue
        idx, frame = item
        buf_frames.append(frame)
        buf_idx.append(idx)
        if len(buf_frames) == args.batch_size:
            flush()
    flush()
    if pending is not None:
        drain(pending)
    elapsed = time.perf_counter() - t0

    with open(args.output, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["filename", "label", "fake_prob", "num_faces"])
        for i, path in enumerate(files):
            prob = sums[i] / counts[i] if counts[i] else 0.0
            label = int(prob >= args.threshold and counts[i] > 0)
            writer.writerow([path.name, label, f"{prob:.4f}", int(counts[i])])

    logger.info(
        f"{n_frames} frames / {len(files)} files in {elapsed:.1f}s "
        f"→ {n_frames / elapsed:.1f} faces/s end-to-end (incl. host decode)"
    )
    logger.info(f"wrote {args.output}")


if __name__ == "__main__":
    main()
