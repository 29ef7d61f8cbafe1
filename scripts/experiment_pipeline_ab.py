#!/usr/bin/env python
"""Reusable paired-seed end-task A/B over ANY pipeline knob.

The accuracy-side twin of ``probe_serving.py --sweep``: where that script
answers "how fast is config X on chip", this one answers "does config X
harm the end task" with a paired-seed ΔAUC confidence interval — the
pre-registered decision procedure for pipeline knobs whose crop-level
fidelity proxies disagree (ROADMAP.md round-5: the w96-fractional warp
window; any future resolution rung).

Protocol (identical to the pooled attention ablation,
``docs/ablation_pooled_n8.json``, so results are comparable):

1. render ONE procedurally labeled corpus (``data/synth_faces.py``),
2. preprocess it once PER ARM through the production
   ``scripts/preprocess_dataset.py`` (arms usually differ only in
   preprocessing knobs, e.g. ``pre:alignment.warp_window=96``; arms with
   identical preprocessing overrides share one processed dir),
3. for each training seed: train + evaluate BOTH arms through the
   production ``scripts/train.py`` / ``scripts/evaluate.py`` (b0
   from-scratch by default, device-cached data loader for tunnel speed),
4. report the paired ΔAUC (treat − control) with a 95% t-CI, written
   incrementally after every completed seed so an interrupted run still
   yields a poolable partial result (``aggregate_ablation.py`` accepts the
   summary schema).

Arms are declared as ``--arm NAME key=val[,key=val...]`` (first arm =
control, second = treat). Override namespaces:

- ``pre:<dotted.path>=<yaml value>``  → preprocessing_config.yaml
- ``model:<dotted.path>=<yaml value>`` → model_config.yaml
- ``face_size=<int>`` → shorthand: sets BOTH ``pre:alignment.output_size``
  and ``model:data.image_size`` (the two must move together)

Examples:

    # warp-window decision (ROADMAP round-5):
    python scripts/experiment_pipeline_ab.py --workdir outputs/ab_w96 \
        --arm w128 pre:alignment.warp_window=128 \
        --arm w96  pre:alignment.warp_window=96 \
        --train-seeds 42,43,44,45,46,47,48,49

    # classify-resolution rung:
    python scripts/experiment_pipeline_ab.py --workdir outputs/ab_192 \
        --arm f224 face_size=224 --arm f192 face_size=192 \
        --train-seeds 42,43,44,45,46,47,48,49

Reference anchor: the knobs under test implement
``/root/reference/src/preprocessing/face_aligner.py:36-128`` (224²
alignment template + warp semantics); the A/B decides whether a faster
TPU-native approximation of that contract is accuracy-neutral end to end.
"""

import argparse
import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from experiment_attention_ablation import _paired_ci95  # noqa: E402


def _parse_value(s: str):
    import yaml

    return yaml.safe_load(s)


def _set_dotted(cfg: dict, dotted: str, value) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


class Arm:
    def __init__(self, name: str, tokens):
        self.name = name
        self.pre: dict = {}
        self.model: dict = {}
        for tok in tokens:
            if "=" not in tok:
                raise SystemExit(f"arm {name}: bad override {tok!r} (want key=value)")
            key, _, val = tok.partition("=")
            val = _parse_value(val)
            if key == "face_size":
                self.pre["alignment.output_size"] = [int(val), int(val)]
                self.model["data.image_size"] = int(val)
            elif key.startswith("pre:"):
                self.pre[key[4:]] = val
            elif key.startswith("model:"):
                self.model[key[6:]] = val
            else:
                raise SystemExit(
                    f"arm {name}: override {key!r} needs a pre:/model: prefix "
                    "(or the face_size shorthand)"
                )

    @property
    def pre_key(self) -> str:
        return json.dumps(sorted(self.pre.items()))


def run(cmd, log_path=None):
    cmd = [str(c) for c in cmd]
    print(f"+ {' '.join(cmd)}", file=sys.stderr, flush=True)
    if log_path:
        with open(log_path, "a") as f:
            subprocess.run(cmd, check=True, stdout=f, stderr=subprocess.STDOUT)
    else:
        subprocess.run(cmd, check=True)


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--workdir", type=str, required=True)
    parser.add_argument("--arm", nargs="+", action="append", required=True,
                        metavar=("NAME", "KEY=VAL"),
                        help="arm name + overrides; give exactly twice "
                        "(control first, then treat)")
    parser.add_argument("--n-per-class", type=int, default=600)
    parser.add_argument("--size", type=int, default=320,
                        help="rendered scene side (= detection canvas)")
    parser.add_argument("--epochs", type=int, default=35)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--seed", type=int, default=42, help="corpus/render seed")
    parser.add_argument("--train-seeds", type=str, default="42,43,44,45,46,47,48,49")
    parser.add_argument("--variant", type=str, default="b0")
    parser.add_argument("--face-size", type=int, default=224,
                        help="default aligned-face side (arms may override)")
    parser.add_argument("--cache", type=str, default="device",
                        choices=["device", "none"],
                        help="data-loader cache mode for train/eval runs")
    parser.add_argument("--skip-render", action="store_true")
    parser.add_argument("--quiet-children", action="store_true",
                        help="redirect train/eval child output to per-run logs")
    args = parser.parse_args()

    import yaml

    arms = [Arm(a[0], a[1:]) for a in args.arm]
    if len(arms) != 2:
        raise SystemExit("exactly two --arm declarations required (control, treat)")
    control, treat = arms
    train_seeds = [int(x) for x in args.train_seeds.split(",")]

    ws = Path(args.workdir)
    ws.mkdir(parents=True, exist_ok=True)
    raw = ws / "raw"

    # 1. Corpus (once) -------------------------------------------------------
    if not args.skip_render and not (raw / "real").exists():
        from deepfake_vit_tpu.data.synth_faces import write_classification_corpus

        print(f"rendering {2 * args.n_per_class} labeled faces → {raw}", file=sys.stderr)
        write_classification_corpus(raw, args.n_per_class, size=args.size, seed=args.seed)

    # 2. Preprocess per distinct preprocessing override set ------------------
    processed_for: dict = {}
    for arm in arms:
        if arm.pre_key in processed_for:
            continue
        processed = ws / f"processed_{arm.name}"
        pre = yaml.safe_load(open(REPO / "deepfake_vit_tpu/configs/preprocessing_config.yaml"))
        pre["detection"]["scrfd"]["input_size"] = [args.size, args.size]
        pre["detection"]["confidence_threshold"] = 0.3
        pre["alignment"]["output_size"] = [args.face_size, args.face_size]
        pre["datasets"]["gen_ai"]["path"] = str(raw)
        pre["output"]["base_dir"] = str(processed)
        pre["logging"]["log_dir"] = str(ws / "logs")
        for k, v in arm.pre.items():
            _set_dotted(pre, k, v)
        pre_cfg = ws / f"pre_{arm.name}.yaml"
        yaml.safe_dump(pre, open(pre_cfg, "w"))
        if not (processed / "splits" / "train.csv").exists():
            run([sys.executable, REPO / "scripts/preprocess_dataset.py",
                 "--config", pre_cfg, "--datasets", "gen_ai"])
        processed_for[arm.pre_key] = processed
    for arm in arms:
        arm.processed = processed_for[arm.pre_key]

    # 3+4. Seed-outer paired loop with incremental summary -------------------
    results = {arm.name: {} for arm in arms}  # name -> {seed: metrics}

    def run_one(arm: Arm, tseed: int) -> dict:
        tag = f"{arm.name}_s{tseed}"
        out_dir = ws / f"eval_{tag}"
        eval_json = out_dir / "eval_test.json"
        if not eval_json.exists():
            cfg = yaml.safe_load(open(REPO / "deepfake_vit_tpu/configs/model_config.yaml"))
            cfg["model"]["feature_extractor"]["variant"] = args.variant
            cfg["data"]["processed_dir"] = str(arm.processed)
            cfg["data"]["batch_size"] = args.batch_size
            cfg["data"]["image_size"] = args.face_size
            if args.cache != "none":
                cfg["data"]["cache"] = args.cache
            cfg["training"]["num_epochs"] = args.epochs
            cfg["training"]["optimizer"]["lr"] = args.lr
            cfg["seed"] = tseed
            cfg.setdefault("checkpoint", {})["save_dir"] = str(ws / f"ckpt_{tag}")
            cfg.setdefault("validation", {})["save_freq"] = max(args.epochs // 2, 1)
            cfg.setdefault("logging", {})["log_dir"] = str(ws / f"runs_{tag}")
            cfg["early_stopping"] = {"patience": args.epochs}  # run all epochs
            for k, v in arm.model.items():
                _set_dotted(cfg, k, v)
            cfg_path = ws / f"model_{tag}.yaml"
            yaml.safe_dump(cfg, open(cfg_path, "w"))
            log = (ws / f"log_{tag}.txt") if args.quiet_children else None
            run([sys.executable, REPO / "scripts/train.py", "--config", cfg_path],
                log_path=log)
            run([sys.executable, REPO / "scripts/evaluate.py",
                 "--checkpoint", ws / f"ckpt_{tag}" / "best_model.ckpt",
                 "--config", cfg_path, "--output-dir", out_dir], log_path=log)
        metrics = json.load(open(eval_json))
        if isinstance(metrics, list):  # save_metrics appends: take latest
            metrics = metrics[-1]
        metrics["train_seed"] = tseed
        return metrics

    def write_summary() -> dict:
        done_seeds = [s for s in train_seeds
                      if s in results[control.name] and s in results[treat.name]]
        def agg(name, key):
            vals = [results[name][s].get(key) for s in done_seeds]
            vals = [v for v in vals if v is not None]
            if not vals:
                return {"mean": None, "std": None, "per_seed": []}
            return {"mean": statistics.mean(vals),
                    "std": statistics.stdev(vals) if len(vals) > 1 else 0.0,
                    "per_seed": vals}

        auc_c, auc_t = agg(control.name, "roc_auc"), agg(treat.name, "roc_auc")
        deltas = [t - c for t, c in zip(auc_t["per_seed"], auc_c["per_seed"])]
        summary = {
            "control": control.name,
            "treat": treat.name,
            "overrides": {control.name: {**control.pre, **control.model},
                          treat.name: {**treat.pre, **treat.model}},
            "auc_control": auc_c,
            "auc_treat": auc_t,
            "acc_control": agg(control.name, "accuracy"),
            "acc_treat": agg(treat.name, "accuracy"),
            "delta_auc_mean": statistics.mean(deltas) if deltas else None,
            "delta_auc_std": statistics.stdev(deltas) if len(deltas) > 1 else 0.0,
            "delta_auc_ci95": _paired_ci95(deltas),
            "delta_auc_per_seed": deltas,
            "train_seeds": done_seeds,
            "n_per_class": args.n_per_class,
            "epochs": args.epochs,
            "variant": args.variant,
            "face_size": args.face_size,
        }
        with open(ws / "summary.json", "w") as f:
            json.dump(summary, f, indent=2)
        return summary

    for tseed in train_seeds:
        for arm in arms:
            results[arm.name][tseed] = run_one(arm, tseed)
        s = write_summary()
        n = len(s["train_seeds"])
        ci = s["delta_auc_ci95"]
        print(f"[{n}/{len(train_seeds)} pairs] ΔAUC({treat.name}−{control.name}) "
              f"mean={s['delta_auc_mean']:+.4f}"
              + (f" CI95=[{ci[0]:+.4f}, {ci[1]:+.4f}]" if ci else ""),
              file=sys.stderr, flush=True)

    print(json.dumps(write_summary()))


if __name__ == "__main__":
    main()
