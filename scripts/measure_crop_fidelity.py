"""Crop-fidelity table: windowed-warp RMSE vs the exact warp, per face-span bin.

Reproduces the BASELINE.md round-3 fidelity tables (w160/w128 x block/frac)
as a durable script — the original numbers came from an ad-hoc /tmp tool —
and extends them with the gated tap-construction modes of the final warp
kernel (``uw16`` rank-2 MXU taps, ``int8`` q7 taps + s8 pixels) so the
post-sweep headline decision has accuracy evidence next to the on-chip
timings (scripts/probe_serving.py --sweep).

Method (same as the BASELINE table): render single-face scenes at the
serving resolution (data/synth_faces.py), build each face's alignment
transform from the GT landmarks exactly like the serving aligner
(umeyama -> the 224^2 template), and compare each windowed configuration
against the exact full-frame warp (ops/warp.py::warp_affine, f32 gather).
Faces are binned by source quad span. Runs on CPU via Pallas interpret
mode (bit-compatible dtype semantics; the on-chip kernels are
parity-tested against interpret in tests/test_pallas_warp.py).

Usage:
    python scripts/measure_crop_fidelity.py [--scenes 48] [--size 640] \
        [--windows 160,128] [--taps legacy,uw16,int8] [--json out.json]

Reference behavioral contract: align-from-original-resolution
(/root/reference/src/preprocessing/face_aligner.py:102-128).
"""

import argparse
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


BINS = ((0.0, 130.0), (130.0, 200.0), (200.0, 1e9))
BIN_LABELS = ("<130px", "130-200px", ">200px")


def quad_span(A_inv, out_size):
    """Max bbox side of the source quad (the window-geometry size driver)."""
    import numpy as np

    Ho, Wo = out_size
    corners = np.asarray(
        [[0, 0], [Wo - 1, 0], [0, Ho - 1], [Wo - 1, Ho - 1]], np.float32
    )
    src = corners @ A_inv[:, :2, :2].transpose(0, 2, 1) + A_inv[:, None, :, 2]
    wh = src.max(axis=1) - src.min(axis=1)
    return wh.max(axis=1)


def build_corpus(rng, n_scenes, size):
    """Single-face scenes with spans spread across the three bins."""
    import numpy as np

    from deepfake_vit_tpu.data.synth_faces import render_scene

    # Head half-width ranges that land the warp quad in each span bin at
    # 640^2 (span ~ 1.4 * half-width after the umeyama fit to the GT kps).
    per_bin = n_scenes // 3
    ranges = [(40, 86), (96, 138), (150, 260)]
    images, kps_list = [], []
    for lo, hi in ranges:
        got = 0
        while got < per_bin:
            img, boxes, kps = render_scene(
                rng, size=size, max_faces=1, min_face=lo, max_face=hi,
                p_empty=0.0,
            )
            if not len(boxes):
                continue
            images.append(img)
            kps_list.append(kps[0])
            got += 1
    return np.stack(images).astype(np.float32), np.stack(kps_list)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scenes", type=int, default=48)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--windows", type=str, default="160,128")
    ap.add_argument("--taps", type=str, default="legacy,uw16,int8")
    ap.add_argument("--geoms", type=str, default="block,frac")
    ap.add_argument("--seed", type=int, default=20260818)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--batch", type=int, default=12,
                    help="scenes per interpret-mode dispatch (VMEM-free on "
                         "CPU; bounds host RAM)")
    args = ap.parse_args()

    import numpy as np

    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from deepfake_vit_tpu.ops.umeyama import invert_affine, umeyama
    from deepfake_vit_tpu.ops.warp import warp_affine, warp_affine_windowed
    from deepfake_vit_tpu.preprocessing.aligner import FaceAligner

    rng = np.random.default_rng(args.seed)
    images, kps = build_corpus(rng, args.scenes, args.size)
    n = len(images)
    print(f"corpus: {n} single-face scenes @ {args.size}^2", file=sys.stderr)

    aligner = FaceAligner(output_size=(224, 224))
    tf = umeyama(jnp.asarray(kps),
                 jnp.broadcast_to(jnp.asarray(aligner.reference), (n, 5, 2)))
    spans = np.asarray(quad_span(np.asarray(invert_affine(tf)), (224, 224)))
    bin_idx = np.digitize(spans, [b[0] for b in BINS[1:]])
    print("bin counts:",
          {BIN_LABELS[i]: int((bin_idx == i).sum()) for i in range(3)},
          file=sys.stderr)

    imgs = jnp.asarray(images)
    exact = np.asarray(warp_affine(imgs, tf, (224, 224)))

    def binned_rmse(out):
        err2 = ((out - exact) ** 2).reshape(n, -1).mean(axis=1)
        return {
            BIN_LABELS[i]: float(np.sqrt(err2[bin_idx == i].mean()))
            for i in range(3)
        } | {"pooled": float(np.sqrt(err2.mean()))}

    results = {}
    windows = [int(w) for w in args.windows.split(",")]
    taps = args.taps.split(",")
    geoms = args.geoms.split(",")
    for window in windows:
        for geom in geoms:
            for tap in taps:
                key = f"w{window}-{geom}-{tap}"
                t0 = time.time()
                chunks = []
                with pltpu.force_tpu_interpret_mode():
                    for s in range(0, n, args.batch):
                        chunks.append(np.asarray(warp_affine_windowed(
                            imgs[s:s + args.batch], tf[s:s + args.batch],
                            (224, 224), window=window,
                            fractional=(geom == "frac"),
                            use_pallas=True, tap_construction=tap,
                        )))
                out = np.concatenate(chunks)
                results[key] = binned_rmse(out)
                row = "  ".join(
                    f"{k}={v:.2f}" for k, v in results[key].items()
                )
                print(f"{key:22s} {row}   [{time.time() - t0:.0f}s]",
                      flush=True)

    if args.json:
        Path(args.json).write_text(json.dumps(
            {"scenes": n, "size": args.size, "spans": spans.tolist(),
             "results": results}, indent=2))
        print(f"wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
