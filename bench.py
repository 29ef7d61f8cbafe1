#!/usr/bin/env python
"""Benchmark: end-to-end faces/sec/chip (detect + align + quality + classify).

Runs the fused single-program pipeline (deepfake_vit_tpu/e2e.py) on the real
chip over synthetic frames and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "faces/sec/chip", "vs_baseline": N}

``vs_baseline`` is measured against the driver north star of 5,000
faces/sec/chip (BASELINE.json; the reference publishes no numbers of its
own — BASELINE.md).

Secondary numbers (classify-only throughput, step latency) go to stderr so
the stdout contract stays one line.

Headline selection: the w128-fractional 224-face config remains the
CONTROL (cross-round anchor); the round-5 settled configuration adds the
int8 SCRFD detector (+2.0%, above the derived 1% margin — see
_pick_headline) and the 192² classify face (−27% step time,
accuracy-NEUTRAL at n=8 paired seeds through the production pipeline:
docs/ab_192_n8.json, pre-registered rule ROADMAP.md round-5 #3), landing
past the 5k north star (5,142.5 faces/s in the deciding sweep,
docs/sweep_r5.jsonl). Candidates are measured against the control in one
same-process A/B sweep (scripts/probe_serving.py) and the best
ACCURACY-CLEARED config wins. Clearance evidence per candidate:
w128-fractional has lower pooled crop RMSE than w160-block in every bin
(round-3 fidelity table); the int8 detector holds the detection
acceptance bars (tests/test_scrfd_int8.py); the 192² face is
end-task-AUC-neutral at n=8 (docs/ab_192_n8.json); S2D-Lite combos gate
on committed weights (= SCRFD-level bars held). The w96 window is
REJECTED end-task (−2.4 AUC points mean at n=8, docs/ab_w96_n8.json) and
never enrolls despite being faster — accuracy clearance is the gate,
timing only picks among the cleared.
"""

import json
import sys
import time

BASELINE_FACES_PER_SEC = 5000.0


def _sync(tree):
    """True device sync: pull a scalar derived from every output leaf.

    NOTE: on the axon tunnel platform ``block_until_ready`` does NOT block;
    only an actual device→host transfer synchronizes. All timings here
    bracket the loop between two such transfers.
    """
    import jax

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


def _argv_opt(name, default):
    """Optional CLI override (testing; the driver runs plain bench.py)."""
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def _default_tokens():
    """Sweep tokens in expected-value order (a timeout keeps the head).

    The S2D-Lite detector combos (``+L``) join only when its trained
    weights are present — weights are committed only after holding the
    SCRFD-level acceptance bars (tests/test_detector_trained.py), so
    presence IS the fidelity gate, matching the candidate-clearance rule
    in the module docstring.
    """
    toks = ["128f", "128f+d/o192", "128f/o192", "128f+d", "160b"]
    from deepfake_vit_tpu.preprocessing.detector import default_weights_path

    if default_weights_path("lite"):
        toks.insert(4, "128f+L")
    return ",".join(toks)


def _tunnel_preflight(retries=3, probe_timeout=240, backoff=180):
    """Bounded device check before anything tries to compile.

    Round 3 ended rc=1 with "Unable to initialize backend 'axon'" and no
    diagnosis (VERDICT r3 weak #2). Backend init on the tunnel platform can
    HANG (not error) when the tunnel is wedged, and an in-process attempt
    can't be timed out — so the probe runs in a CHILD process under a hard
    timeout. The probe is a tiny f32 device_put/get round-trip: it holds no
    compile, so a timeout kill cannot wedge the tunnel further (CLAUDE.md).
    Returns True when a device answered; on False the caller should exit
    with a crisp diagnosis instead of hanging the driver.
    """
    import subprocess

    probe = (
        "import numpy as np, jax\n"
        "d = jax.devices()[0]\n"
        "x = jax.device_put(np.ones((8, 128), np.float32), d)\n"
        "assert float(jax.device_get(x).sum()) == 1024.0\n"
        "print('PREFLIGHT_OK', d.platform)\n"
    )
    for attempt in range(1, retries + 1):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            out = (proc.stdout or "").strip().splitlines()
            if proc.returncode == 0 and out and out[-1].startswith("PREFLIGHT_OK"):
                print(f"preflight: device up ({out[-1]})", file=sys.stderr)
                return True
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            print(f"preflight attempt {attempt}/{retries}: probe rc="
                  f"{proc.returncode}; stderr tail: {' | '.join(tail)}",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"preflight attempt {attempt}/{retries}: probe hung "
                  f">{probe_timeout}s (backend init blocked — tunnel wedged "
                  f"or relay down)", file=sys.stderr)
        if attempt < retries:
            time.sleep(backoff)
    return False


def _candidate_sweep(batch, tokens, timeout_s=2100):
    """Run the control + gated-candidate A/B sweep in a child process.

    The child (probe_serving.py --sweep) measures the CONTROL config first
    under the exact bench protocol (same weights, calibration, frames,
    warmup/iters), then each candidate, appending one JSON line per result
    as it lands. Child-first keeps exactly one process on the single
    tunnel chip, and bounds the whole sweep: on timeout the child is
    ABANDONED, not killed (killing a possibly-mid-compile process wedges
    the tunnel for ~40 min — CLAUDE.md), and whatever results it already
    flushed are used. Token order is expected-value order so a timeout
    keeps the most valuable measurements.
    """
    import os
    import subprocess
    import tempfile

    from deepfake_vit_tpu.utils import get_project_root

    out = tempfile.NamedTemporaryFile(
        mode="w", suffix=".jsonl", prefix="bench_cand_", delete=False
    ).name
    script = get_project_root() / "scripts" / "probe_serving.py"
    proc = subprocess.Popen(
        [sys.executable, str(script), "--batch", str(batch),
         "--int8-static", "--int8-start", "10",
         "--sweep", tokens,
         "--json", out],
        stdout=sys.stderr, stderr=sys.stderr,
    )
    try:
        proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print("candidate sweep timed out; abandoning the child (never kill "
              "a possibly-mid-compile process) and using partial results",
              file=sys.stderr)
    results = []
    if os.path.exists(out):
        with open(out) as f:
            for line in f:
                try:
                    results.append(json.loads(line))
                except ValueError:
                    pass
    return results


def _pick_headline(results, control_label="w128frac-legacy", margin=1.01):
    """Pick (fps, cfg_note) from sweep records, or (None, None).

    The control must be present (it anchors the same-process A/B); a
    candidate wins only by a >margin same-process advantage. Failed combos
    (records with an "error" key) never participate.

    Margin derivation (round-5, pre-registered in ROADMAP before the
    deciding sweep ran): the deciding sweep measured the control TWICE in
    one process (first and last of 8 combos, ~15 min apart) — repeat
    drift 0.235% (3,957.0 vs 3,947.7, docs/sweep_r5.jsonl) — so the flip
    margin is max(1%, 3×drift) = 1%. The old 2% value was set from
    CROSS-run tunnel variance (±20%), which same-process A/Bs don't see.
    """
    ok = [r for r in results if "faces_per_sec" in r]
    ctrl = next((r for r in ok if r["label"] == control_label), None)
    if ctrl is None:
        return None, None
    fps = ctrl["faces_per_sec"]
    cfg = f"{control_label} (settled round-4 config)"
    cands = [r for r in ok if r["label"] != control_label]
    if cands:
        best = max(cands, key=lambda r: r["faces_per_sec"])
        if best["faces_per_sec"] > margin * fps:
            cfg = (f"{best['label']} (candidate pick: beat the control's "
                   f"{fps:.1f} faces/s in-process)")
            fps = best["faces_per_sec"]
    return fps, cfg


def _build_headline(model_config, batch, serving, det_size):
    """Build the settled headline pipeline + inputs on the accelerator.

    Headline config: frames enter at the reference's 640² resolution
    (preprocessing_config.yaml:12-15 detects at 640²) as uint8 (the
    serving wire format — 4× less H2D than f32); detection runs via the
    stem-folded SCRFD (the 2× pool rides the first conv), alignment warps
    from the ORIGINAL 640² pixels via the pool-fused FRACTIONAL w128
    windowed warp (round-4 sweep winner: +13.8% over w160-block AND lower
    pooled crop RMSE in every bin), and the classifier runs the
    parity-gated int8 late-stage tail (tests/test_int8_tail.py). Detection quality at
    the 320² canvas is held by the trained-weights acceptance tests
    (tests/test_detector_trained.py).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepfake_vit_tpu.e2e import FusedPipeline

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    # Settled round-5 config: fractional w128 warp + int8 SCRFD detector
    # (static scales, +2.0% > the derived 1% margin) + 192² classify face
    # (accuracy-neutral at n=8, docs/ab_192_n8.json; −27% step time) +
    # static-int8 tail from stage 3.
    pipe = FusedPipeline(model_config, detection_input_size=det_size,
                         serving_size=serving, confidence_threshold=0.0,
                         use_int8_tail=True, int8_tail_start=10,
                         warp_window=128, warp_fractional=True,
                         use_int8_detector=True, output_size=(192, 192))
    # Initialize on the host CPU backend (local, fast compile), then move to
    # the accelerator — compiles over the TPU tunnel cost minutes each.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # load_variables overlays the committed trained detector weights
        # (same FLOPs as random init; keeps the headline number honest).
        det_vars, model_vars = pipe.load_variables(jax.random.PRNGKey(0))
        # Static calibrated activation scales + the stage-3 split: the
        # measured round-3 continuation optimum (73.56 vs 75.00 ms @ b256;
        # dynamic scales made stage 3 LOSE — BASELINE.md). Calibration
        # inputs only set scale VALUES (accuracy is gated on representative
        # faces in tests/test_int8_tail.py); timing is value-independent.
        pipe.calibrate_int8(
            model_vars,
            np.random.default_rng(1).uniform(0, 255, (8, *pipe.output_size, 3)),
            batch_size=8,
        )
        pipe.det_act_scales = pipe.calibrate_int8_detector(
            det_vars,
            np.random.default_rng(2).uniform(0, 255, (4, *serving, 3))
            .astype(np.float32),
        )
        pipe.forward = jax.jit(pipe._graph)
    det_vars, model_vars = jax.device_put((det_vars, model_vars), dev)
    # Warm the tunnel's first-uint8-transfer path with a tiny real buffer
    # before the big frame upload (CLAUDE.md: the FIRST uint8 device_put in
    # a process crawls at ~0.05 MB/s; steady state is ~30-55 MB/s).
    jax.device_get(jax.device_put(np.ones((8, 128), np.uint8), dev))
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(batch, *serving, 3)),
        jnp.uint8,
    )
    return pipe, det_vars, model_vars, frames


def main():
    from deepfake_vit_tpu.utils import enable_compilation_cache, load_config, get_project_root

    enable_compilation_cache()

    cfg_dir = get_project_root() / "deepfake_vit_tpu" / "configs"
    model_config = load_config(cfg_dir / "model_config.yaml")

    serving = (640, 640)
    det_size = (320, 320)
    batch = int(_argv_opt("--batch", 256))
    tokens = _argv_opt("--sweep-tokens", _default_tokens())

    if not _tunnel_preflight():
        print("BENCH ABORT: no accelerator answered a no-compile f32 "
              "round-trip after bounded retries. Diagnosis: the axon tunnel "
              "is down or wedged (backend init hangs); nothing can be "
              "measured. This is an infrastructure condition, not a "
              "framework regression — re-run once the tunnel answers "
              "(see /tmp/tunnel_watch_r4.log pattern).", file=sys.stderr)
        sys.exit(1)

    headline_fps = None
    headline_cfg = ("w128-fractional + int8 detector + 192-face "
                    "(settled round-5 config)")

    # Child-first measurement (see _candidate_sweep): the child re-measures
    # the control under the identical protocol, then A/Bs the candidates in
    # the same process (tunnel run-to-run variance is ±20%, in-process A/B
    # is the only trustworthy comparison — BASELINE.md). The headline flips
    # to a candidate only on a >2% same-process win over the child's own
    # control — the documented flip criterion.
    try:
        results = _candidate_sweep(batch, tokens)
        for r in results:
            print(f"sweep: {r}", file=sys.stderr)
        picked_fps, picked_cfg = _pick_headline(results)
        if picked_fps is not None:
            headline_fps, headline_cfg = picked_fps, picked_cfg
    except Exception as e:  # sweep is best-effort — never kill the bench
        msg = str(e).splitlines()[0][:160] if str(e) else ""
        print(f"candidate sweep failed ({type(e).__name__}: {msg})",
              file=sys.stderr)

    pipe = det_vars = model_vars = frames = None
    if headline_fps is None:
        # Fallback: the child produced nothing (e.g. crashed before its
        # control landed) — measure the settled control in-process.
        pipe, det_vars, model_vars, frames = _build_headline(
            model_config, batch, serving, det_size)
        t = _time_fn(pipe.forward, det_vars, model_vars, frames,
                     iters=10, warmup=2)
        headline_fps = batch / t
        print(f"end-to-end: {headline_fps:.1f} faces/s (batch {batch}, "
              f"{t*1e3:.2f} ms/step, serving 640² / detect 320² / int8 "
              f"detector / 192² face / static-int8 tail from stage 3 / "
              f"fractional window 128)",
              file=sys.stderr)
        headline_cfg += " [in-process fallback]"

    print(f"headline config: {headline_cfg}", file=sys.stderr)
    # "config" makes the driver's BENCH_rN history self-describing — the
    # winning configuration label travels with the number (VERDICT r3
    # weak #5), instead of living only in stderr.
    print(json.dumps({
        "metric": "end_to_end_faces_per_sec_per_chip",
        "value": round(headline_fps, 1),
        "unit": "faces/sec/chip",
        "vs_baseline": round(headline_fps / BASELINE_FACES_PER_SEC, 3),
        "config": headline_cfg,
    }), flush=True)

    if "--full" in sys.argv:
        import gc

        import jax
        import jax.numpy as jnp
        import numpy as _np

        from deepfake_vit_tpu.e2e import FusedPipeline

        if pipe is None:
            pipe, det_vars, model_vars, frames = _build_headline(
                model_config, batch, serving, det_size)
            _sync(pipe.forward(det_vars, model_vars, frames))  # warm/compile
        cpu = jax.devices("cpu")[0]

        # Secondary e2e configs (BASELINE.md history / reference-equivalence):
        # (a) the w128 warp window — full MXU tiles in the warp matmul, at a
        #     measured crop-fidelity cost (BASELINE round-3 RMSE table);
        # (b) full 640² detection canvas — exactly the reference's detector
        #     resolution end to end; (c) round-1's 320² serving canvas.
        for name, srv, det, kw in (
            ("e2e w128 warp window (fast knob)", (640, 640), (320, 320),
             dict(use_int8_tail=True, warp_window=128)),
            ("e2e 640² detect", (640, 640), (640, 640), dict(use_int8_tail=True)),
            ("e2e 640² serving / 160² detect (fast knob)", (640, 640), (160, 160),
             dict(use_int8_tail=True)),
            ("e2e 320² canvas (round-1 cfg)", (320, 320), (320, 320),
             dict(use_int8_tail=True)),
        ):
            p2 = FusedPipeline(model_config, detection_input_size=det,
                               serving_size=srv, confidence_threshold=0.0, **kw)
            fr2 = frames[:, :srv[0], :srv[1], :]
            t2 = _time_fn(p2.forward, det_vars, model_vars, fr2, iters=10, warmup=2)
            print(f"{name}: {fr2.shape[0] / t2:.1f} faces/s ({t2*1e3:.2f} ms/step)",
                  file=sys.stderr)
            del p2, fr2

        from deepfake_vit_tpu.models import DeepfakeDetectionModel
        from deepfake_vit_tpu.training import (
            TrainState, create_optimizer, make_criterion, make_train_step,
        )

        # Free the e2e pipeline's device buffers before compiling the train
        # step: XLA sizes rematerialization to the HBM free at compile time,
        # and a step compiled under pressure stays slow afterwards.
        del det_vars, model_vars, frames, pipe
        gc.collect()

        # classify-only (BASELINE config 1: forward on pre-aligned crops)
        model = DeepfakeDetectionModel(variant="b4", dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        imgs = jnp.asarray(
            _np.random.default_rng(1).normal(0, 1, (64, 224, 224, 3)), jnp.float32
        )
        lms = jnp.asarray(
            _np.random.default_rng(2).uniform(0, 224, (64, 5, 2)), jnp.float32
        )
        with jax.default_device(cpu):
            variables = model.init(
                {"params": rng, "dropout": rng},
                _np.zeros((1, 224, 224, 3), _np.float32),
                _np.zeros((1, 5, 2), _np.float32),
            )
        variables_dev = jax.device_put(variables, jax.devices()[0])
        fwd = jax.jit(lambda v, i, l: model.apply(v, i, l, train=False)[0])
        t_cls = _time_fn(fwd, variables_dev, imgs, lms, iters=10, warmup=2)
        print(f"classify-only: {64 / t_cls:.1f} faces/s ({t_cls*1e3:.2f} ms / batch 64)",
              file=sys.stderr)

        # classify-only through the int8 late-stage tail (the serving path).
        from deepfake_vit_tpu.models.efficientnet import EfficientNetBackbone, block_args
        from deepfake_vit_tpu.models.int8_tail import Int8TailRunner, default_tail_start

        start = default_tail_start(model.variant)
        backbone_cap = EfficientNetBackbone(
            variant=model.variant, capture_indices=(start - 1,), dtype=jnp.bfloat16
        )

        def int8_fwd(v, i, l):
            bbp = v["params"]["feature_extractor"]["backbone"]
            bbs = v["batch_stats"]["feature_extractor"]["backbone"]
            _, inter = backbone_cap.apply(
                {"params": bbp, "batch_stats": bbs}, i, train=False,
                return_maps=True, return_intermediate=True,
            )
            x_tail = Int8TailRunner(model.variant, bbp, bbs)(inter[start - 1])
            return model.apply(v, x_tail, l, train=False,
                               backbone_start_block=len(block_args(model.variant)))[0]

        try:
            fwd_int8 = jax.jit(int8_fwd)
            t_clf = _time_fn(fwd_int8, variables_dev, imgs, lms, iters=10, warmup=2)
            print(f"classify-only (int8 tail): {64 / t_clf:.1f} faces/s "
                  f"({t_clf*1e3:.2f} ms / batch 64)", file=sys.stderr)
        except Exception as e:  # secondary metric only — never kill the bench
            print(f"classify-only (int8 tail): failed ({type(e).__name__})",
                  file=sys.stderr)

        # training step (BASELINE config 3: CombinedLoss fwd+bwd+AdamW)
        opt = create_optimizer({"type": "AdamW", "lr": 1e-4}, gradient_clip=1.0)
        crit = make_criterion({"type": "CombinedLoss"})
        with jax.default_device(cpu):
            state = TrainState.create(
                variables["params"], variables["batch_stats"], opt.init(variables["params"])
            )
        state = jax.device_put(state, jax.devices()[0])
        batch_tr = {
            "image": imgs,
            "label": jnp.asarray(_np.arange(64, dtype=_np.int32) % 2),
            "landmarks": lms,
        }
        step = make_train_step(model, crit, opt, mesh=None, donate=False)
        key = jax.random.PRNGKey(1)
        s, m = step(state, batch_tr, key)
        _sync(m)
        t0 = time.perf_counter()
        for _ in range(10):
            s, m = step(s, batch_tr, key)
        _sync(m)
        t_tr = (time.perf_counter() - t0) / 10
        print(f"train-step: {64 / t_tr:.1f} samples/s ({t_tr*1e3:.2f} ms / batch 64)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
