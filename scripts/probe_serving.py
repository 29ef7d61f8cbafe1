"""One-config serving-throughput probe for flag/batch experiments.

Times the headline FusedPipeline forward (same measurement protocol as
bench.py: warmup + transfer-bracketed loop) at an arbitrary batch size so
XLA-flag and batch-size sweeps don't have to edit bench.py.

Usage:
    XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
        python scripts/probe_serving.py --batch 256 --iters 10
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_sweep_tokens(sweep: str):
    """Parse --sweep tokens: ``<window><b|f>[-taps][+d|+L][/oN][@batch]``.

    ``+d`` = int8 SCRFD detector (static scales); ``+L`` = the S2D-Lite
    detector family (models/lite_detector.py) in place of SCRFD. They are
    mutually exclusive (the int8 detector graph is SCRFD-only — e2e.py).
    ``/oN`` overrides the aligned-face (classify input) side for that combo
    (e.g. ``128f/o192`` — the resolution-ladder rung; accuracy side decided
    by scripts/experiment_pipeline_ab.py ``face_size=`` arms).
    ``@N`` overrides the serving batch for that combo only (e.g.
    ``128f@512``) — batch-size A/Bs must live in ONE process like every
    other comparison on this tunnel (run-to-run variance is ±20%,
    BASELINE.md); the frame buffer is built once at the max batch and
    device-sliced per combo.
    Returns (window, fractional, taps, int8_det, lite, batch|None,
    out_size|None) tuples.
    """
    combos = []
    for tok in sweep.split(","):
        tok = tok.strip()
        tok, at, bat = tok.partition("@")
        if at and not bat.isdigit():
            raise SystemExit(f"bad sweep batch suffix @{bat!r}: want @<int>")
        tok, slash, osz = tok.partition("/o")
        if slash and not osz.isdigit():
            raise SystemExit(f"bad sweep face-size suffix /o{osz!r}: want /o<int>")
        lite = tok.endswith("+L")
        int8_det = tok.endswith("+d")
        if lite or int8_det:
            tok = tok[:-2]
        tok, _, taps = tok.partition("-")
        if not tok or tok[-1] not in ("b", "f") or not tok[:-1].isdigit():
            raise SystemExit(
                f"bad sweep token {tok!r}: want "
                "<window><b|f>[-taps][+d|+L][/oN][@batch]"
            )
        combos.append((int(tok[:-1]), tok[-1] == "f", taps or "legacy",
                       int8_det, lite, int(bat) if bat else None,
                       int(osz) if osz else None))
    return combos


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--warp-window", type=int, default=160)
    ap.add_argument("--warp-fractional", action="store_true",
                    help="fractional-scale windowed crop (BASELINE.md "
                    "round-3 continuation fidelity table)")
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--int8-static", action="store_true",
                    help="calibrated static activation scales instead of "
                    "dynamic per-image scales (calibrates on random faces — "
                    "scale VALUES don't affect timing)")
    ap.add_argument("--int8-start", type=int, default=None,
                    help="first quantized flat block (default: stage 4)")
    ap.add_argument("--options", type=str, default=None,
                    help="comma-separated XLA compiler options k=v passed via "
                    "lower().compile(compiler_options=...) — the client-side "
                    "XLA_FLAGS parser aborts on TPU-backend-only flags, but "
                    "PJRT env_option_overrides reach the tunnel compiler")
    ap.add_argument("--warp-taps", type=str, default="legacy",
                    choices=["legacy", "uw", "uw16", "int8"],
                    help="warp-kernel tap construction "
                    "(ops/pallas/warp_kernel.py)")
    ap.add_argument("--detector-arch", type=str, default="scrfd",
                    choices=["scrfd", "lite"],
                    help="detection family for the single-config probe "
                    "(lite = S2D-Lite, models/lite_detector.py)")
    ap.add_argument("--int8-detector", action="store_true",
                    help="run the SCRFD forward as s8×s8→s32 MXU convs "
                    "(models/scrfd_int8.py), dynamic activation scales")
    ap.add_argument("--det-static", action="store_true",
                    help="with --int8-detector: static calibrated activation "
                    "scales (removes the per-conv max-abs + quantize passes)")
    ap.add_argument("--sweep", type=str, default=None,
                    help="same-process warp-config sweep: comma-separated "
                    "<window><b|f>[-taps][+d|+L][/oN][@batch] combos, e.g. "
                    "'160b,128f-uw16,128f+d,128f/o192,128f@512' "
                    "(b = 2^l block average, f = fractional taps; +d = int8 "
                    "detector, static scales; +L = the S2D-Lite detector "
                    "family; /oN = classify face side; @N = per-combo "
                    "batch). Each combo is a fresh "
                    "FusedPipeline sharing the loaded weights and the one "
                    "int8 calibration; timed under the one-process control "
                    "protocol of BASELINE.md round-3 tables")
    ap.add_argument("--json", type=str, default=None,
                    help="with --sweep: append one JSON line per combo to this "
                    "path, flushed as each result lands (machine-readable "
                    "partial results for bench.py's bounded candidate pick)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepfake_vit_tpu.e2e import FusedPipeline
    from deepfake_vit_tpu.utils import (
        enable_compilation_cache, get_project_root, load_config,
    )

    enable_compilation_cache()
    model_config = load_config(
        get_project_root() / "deepfake_vit_tpu" / "configs" / "model_config.yaml"
    )
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})  XLA_FLAGS={os.environ.get('XLA_FLAGS', '')}",
          file=sys.stderr)

    pipe = FusedPipeline(
        model_config, detection_input_size=(320, 320), serving_size=(640, 640),
        confidence_threshold=0.0, use_int8_tail=not args.no_int8,
        int8_tail_start=args.int8_start,
        warp_window=args.warp_window,
        warp_fractional=args.warp_fractional,
        warp_tap_mode=args.warp_taps,
        use_int8_detector=args.int8_detector,
        detector_arch=args.detector_arch,
    )
    det_scales = None
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        det_vars, model_vars = pipe.load_variables(jax.random.PRNGKey(0))
        if args.int8_static:
            # Calibrate on the CPU backend (the scales are host floats;
            # no reason to spend a tunnel compile on the throwaway
            # calibration graph).
            t_cal = time.perf_counter()
            faces = np.random.default_rng(1).uniform(
                0, 255, (8, *pipe.output_size, 3)
            ).astype(np.float32)
            pipe.calibrate_int8(model_vars, faces, batch_size=8)
            print(f"calibrated static int8 scales in "
                  f"{time.perf_counter()-t_cal:.1f} s", file=sys.stderr)
        if args.det_static or (args.sweep and "+d" in args.sweep):
            t_cal = time.perf_counter()
            cal_frames = np.random.default_rng(2).uniform(
                0, 255, (4, *pipe.serving_size, 3)
            ).astype(np.float32)
            cal = FusedPipeline(
                model_config, detection_input_size=(320, 320),
                serving_size=(640, 640), use_int8_detector=True,
            )
            det_scales = cal.calibrate_int8_detector(det_vars, cal_frames)
            if args.det_static:
                pipe.det_act_scales = det_scales
                pipe.forward = jax.jit(pipe._graph)
            print(f"calibrated static int8 DETECTOR scales in "
                  f"{time.perf_counter()-t_cal:.1f} s", file=sys.stderr)
    det_vars, model_vars = jax.device_put((det_vars, model_vars), dev)

    # Warm the tunnel's first-uint8-transfer path with a tiny real buffer
    # before the big frame upload (BASELINE.md: first uint8 device_put in a
    # process crawls at ~0.05 MB/s; steady state is ~30-55 MB/s).
    jax.device_get(jax.device_put(np.ones((8, 128), np.uint8), dev))
    sweep_combos = parse_sweep_tokens(args.sweep) if args.sweep else []
    max_batch = max([args.batch] + [b for *_, b, _o in sweep_combos if b])
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(max_batch, 640, 640, 3)),
        jnp.uint8,
    )

    def _sync(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jax.device_get([l.ravel()[0] for l in leaves if hasattr(l, "ravel")])

    if args.sweep:
        def emit(rec):
            if args.json:
                with open(args.json, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                    f.flush()
                    os.fsync(f.fileno())

        combos = sweep_combos
        lite_det_vars = None
        if any(lite for *_, lite, _b, _o in combos):
            # The S2D-Lite family has its own parameter tree: init + weight
            # overlay through the same load_variables path the headline
            # uses, on the CPU backend (tunnel compiles cost minutes).
            # Fail-soft: a bad/mid-write weights file must drop only the
            # +L combos, never the control anchoring the whole sweep.
            try:
                lp = FusedPipeline(
                    model_config, detection_input_size=(320, 320),
                    serving_size=(640, 640), confidence_threshold=0.0,
                    detector_arch="lite",
                )
                with jax.default_device(cpu):
                    lite_det_vars, _ = lp.load_variables(jax.random.PRNGKey(0))
                lite_det_vars = jax.device_put(lite_det_vars, dev)
            except Exception as e:
                msg = str(e).splitlines()[0][:200] if str(e) else ""
                print(f"lite weight tree unavailable "
                      f"({type(e).__name__}: {msg}); dropping +L combos",
                      file=sys.stderr)
                combos = [c for c in combos if not c[4]]
        for window, frac, taps, int8_det, lite, cbatch, osize in combos:
            b = cbatch or args.batch
            fr = frames if b == max_batch else frames[:b]
            label = (f"w{window}{'frac' if frac else 'block'}-{taps}"
                     f"{'+int8det' if int8_det else ''}"
                     f"{'+lite' if lite else ''}"
                     f"{f'/o{osize}' if osize else ''}"
                     f"{f'@b{b}' if b != args.batch else ''}")
            # Fail-soft per combo: a Mosaic lowering rejection (e.g. an s8
            # dot an older toolchain can't emit) must not kill the rest of
            # an unattended sweep.
            try:
                p = FusedPipeline(
                    model_config, detection_input_size=(320, 320),
                    serving_size=(640, 640), confidence_threshold=0.0,
                    use_int8_tail=not args.no_int8,
                    int8_tail_start=args.int8_start,
                    # /oN combos reuse the 224²-calibrated scales: the
                    # per-layer scalars shift slightly with input size but
                    # timing is value-independent (accuracy for a flipped
                    # face size would be re-gated at promotion time).
                    int8_act_scales=pipe.int8_act_scales,
                    warp_window=window, warp_fractional=frac,
                    warp_tap_mode=taps,
                    use_int8_detector=int8_det, det_act_scales=det_scales,
                    detector_arch="lite" if lite else "scrfd",
                    **(dict(output_size=(osize, osize)) if osize else {}),
                )
                dv = lite_det_vars if lite else det_vars
                t_c0 = time.perf_counter()
                out = p.forward(dv, model_vars, fr)
                _sync(out)
                print(f"  {label} compile+run {time.perf_counter() - t_c0:.1f} s",
                      file=sys.stderr)
                for _ in range(args.warmup - 1):
                    _sync(p.forward(dv, model_vars, fr))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = p.forward(dv, model_vars, fr)
                _sync(out)
                t = (time.perf_counter() - t0) / args.iters
                print(f"e2e b{b} {label}: "
                      f"{b / t:.1f} faces/s ({t * 1e3:.2f} ms/step)")
                emit({"label": label, "window": window, "fractional": frac,
                      "taps": taps, "int8_detector": int8_det, "lite": lite,
                      "batch": b, "out_size": osize,
                      "ms": round(t * 1e3, 2),
                      "faces_per_sec": round(b / t, 1)})
            except Exception as e:
                msg = str(e).splitlines()[0][:200] if str(e) else ""
                print(f"e2e b{b} {label}: FAILED "
                      f"({type(e).__name__}: {msg})")
                emit({"label": label, "window": window, "fractional": frac,
                      "taps": taps, "int8_detector": int8_det, "lite": lite,
                      "batch": b, "out_size": osize,
                      "error": f"{type(e).__name__}: {msg}"})
        return

    fwd = pipe.forward
    if args.options:
        opts = {}
        for kv in args.options.split(","):
            k, v = kv.split("=", 1)
            opts[k] = {"true": True, "false": False}.get(v.lower(), v)
        print(f"compiler_options: {opts}", file=sys.stderr)
        fwd = pipe.forward.lower(det_vars, model_vars, frames).compile(
            compiler_options=opts
        )

    t_c0 = time.perf_counter()
    out = fwd(det_vars, model_vars, frames)
    _sync(out)
    print(f"first call (compile+run): {time.perf_counter() - t_c0:.1f} s",
          file=sys.stderr)
    for _ in range(args.warmup - 1):
        _sync(fwd(det_vars, model_vars, frames))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(det_vars, model_vars, frames)
    _sync(out)
    t = (time.perf_counter() - t0) / args.iters
    print(f"e2e b{args.batch} w{args.warp_window}: {args.batch / t:.1f} faces/s "
          f"({t * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
