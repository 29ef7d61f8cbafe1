#!/usr/bin/env python
"""End-to-end training-to-AUC experiment with an attention ablation.

Real face data cannot reach this environment, so the strongest available
evidence for the architecture's semantics (VERDICT round-1 item 6) is built
here: procedurally rendered faces where "fake" = the same face with
localized deepfake-style artifacts at landmark regions
(``data/synth_faces.py::render_labeled_face``). The experiment drives the
REAL production path end to end:

1. render a raw real/fake corpus (GenAI disk layout),
2. ``scripts/preprocess_dataset.py`` — detection with the trained SCRFD
   weights, alignment, quality, splits,
3. ``scripts/train.py`` twice from one config template: full hybrid
   attention vs. ablated (no landmark attention), identical seeds/epochs,
4. ``scripts/evaluate.py`` on the shared test split → ROC-AUC per arm.

Prints one JSON line {"auc_attention", "auc_ablation", "delta", ...} and
appends a row to BASELINE.md by hand (see that file's round-2 table).
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _paired_ci95(deltas):
    """95% CI on the mean paired ΔAUC (t-distribution, n-1 dof)."""
    import statistics

    n = len(deltas)
    if n < 2:
        return None
    mean = statistics.mean(deltas)
    se = statistics.stdev(deltas) / n ** 0.5
    try:
        from scipy.stats import t

        q = float(t.ppf(0.975, n - 1))
    except ImportError:  # two-sided 97.5% t quantiles, dof 1..29
        table = [12.71, 4.30, 3.18, 2.78, 2.57, 2.45, 2.36, 2.31, 2.26, 2.23,
                 2.20, 2.18, 2.16, 2.14, 2.13, 2.12, 2.11, 2.10, 2.09, 2.09,
                 2.08, 2.07, 2.07, 2.06, 2.06, 2.06, 2.05, 2.05, 2.05]
        q = table[min(n - 2, len(table) - 1)]
    return [mean - q * se, mean + q * se]


def run(cmd, env_extra=None):
    import os

    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    print(f"+ {' '.join(str(c) for c in cmd)}", file=sys.stderr, flush=True)
    subprocess.run([str(c) for c in cmd], check=True, env=env)


def main():
    parser = argparse.ArgumentParser(description="AUC + attention ablation experiment")
    parser.add_argument("--workdir", type=str, default="outputs/ablation_experiment")
    parser.add_argument("--n-per-class", type=int, default=600)
    parser.add_argument("--size", type=int, default=320)
    parser.add_argument("--epochs", type=int, default=35)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=3e-4,
                        help="from-scratch training (no ImageNet weights in the "
                        "image) wants a hotter LR than the fine-tune default")
    parser.add_argument("--seed", type=int, default=42,
                        help="corpus/render seed (data is FIXED across training seeds)")
    parser.add_argument("--train-seeds", type=str, default=None,
                        help="comma-separated training seeds, e.g. '42,43,44' — "
                        "runs each arm once per seed on the SAME data and "
                        "reports mean ± std AUC (VERDICT round-2 item 5: the "
                        "single-seed +0.03 delta needs error bars)")
    parser.add_argument("--variant", type=str, default="b0")
    parser.add_argument("--face-size", type=int, default=224,
                        help="aligned-face side fed to the classifier "
                        "(preprocessing alignment.output_size). 224 matches "
                        "the reference recipe; smaller (e.g. 128) makes a "
                        "CPU-backend multi-seed replicate tractable when the "
                        "chip is unavailable — the attention modules operate "
                        "on backbone feature maps, so the ablation contrast "
                        "is preserved at any input side")
    parser.add_argument("--skip-render", action="store_true")
    parser.add_argument("--skip-preprocess", action="store_true")
    args = parser.parse_args()

    import yaml

    ws = Path(args.workdir)
    ws.mkdir(parents=True, exist_ok=True)
    raw = ws / "raw"
    processed = ws / "processed"

    # 1. Corpus --------------------------------------------------------------
    if not args.skip_render:
        from deepfake_vit_tpu.data.synth_faces import write_classification_corpus

        print(f"rendering {2 * args.n_per_class} labeled faces → {raw}", file=sys.stderr)
        write_classification_corpus(raw, args.n_per_class, size=args.size, seed=args.seed)

    # 2. Preprocess through the production pipeline --------------------------
    pre = yaml.safe_load(open(REPO / "deepfake_vit_tpu/configs/preprocessing_config.yaml"))
    pre["detection"]["scrfd"]["input_size"] = [args.size, args.size]
    pre["detection"]["confidence_threshold"] = 0.3
    pre["alignment"]["output_size"] = [args.face_size, args.face_size]
    pre["datasets"]["gen_ai"]["path"] = str(raw)
    pre["output"]["base_dir"] = str(processed)
    pre["logging"]["log_dir"] = str(ws / "logs")
    pre_cfg = ws / "pre.yaml"
    yaml.safe_dump(pre, open(pre_cfg, "w"))
    if not args.skip_preprocess:
        run([sys.executable, REPO / "scripts/preprocess_dataset.py",
             "--config", pre_cfg, "--datasets", "gen_ai"])

    # 3+4. Train + evaluate both arms (× training seeds) ---------------------
    train_seeds = (
        [int(x) for x in args.train_seeds.split(",")]
        if args.train_seeds else [args.seed]
    )
    results = {"attention": [], "ablation": []}
    for arm, use_landmark in (("attention", True), ("ablation", False)):
      for tseed in train_seeds:
          cfg = yaml.safe_load(open(REPO / "deepfake_vit_tpu/configs/model_config.yaml"))
          cfg["model"]["feature_extractor"]["variant"] = args.variant
          cfg["model"]["feature_extractor"]["attention_config"]["use_landmark"] = use_landmark
          if not use_landmark:
              # Full ablation arm: no landmark-derived signal anywhere.
              cfg["model"]["feature_extractor"]["attention_config"]["use_spatial"] = False
              cfg["model"]["feature_extractor"]["attention_config"]["use_channel"] = False
              cfg["model"]["feature_extractor"]["use_attention"] = False
          cfg["data"]["processed_dir"] = str(processed)
          cfg["data"]["batch_size"] = args.batch_size
          cfg["training"]["num_epochs"] = args.epochs
          cfg["training"]["optimizer"]["lr"] = args.lr
          cfg["seed"] = tseed
          tag = f"{arm}_s{tseed}" if len(train_seeds) > 1 else arm
          cfg.setdefault("checkpoint", {})["save_dir"] = str(ws / f"ckpt_{tag}")
          cfg.setdefault("validation", {})["save_freq"] = max(args.epochs // 2, 1)
          cfg.setdefault("logging", {})["log_dir"] = str(ws / f"runs_{tag}")
          cfg["early_stopping"] = {"patience": args.epochs}  # run all epochs
          cfg_path = ws / f"model_{tag}.yaml"
          yaml.safe_dump(cfg, open(cfg_path, "w"))

          run([sys.executable, REPO / "scripts/train.py", "--config", cfg_path])
          out_dir = ws / f"eval_{tag}"
          run([sys.executable, REPO / "scripts/evaluate.py",
               "--checkpoint", ws / f"ckpt_{tag}" / "best_model.ckpt",
               "--config", cfg_path, "--output-dir", out_dir])
          metrics = json.load(open(out_dir / "eval_test.json"))
          if isinstance(metrics, list):  # save_metrics appends: take latest
              metrics = metrics[-1]
          metrics["train_seed"] = tseed
          results[arm].append(metrics)

    import statistics

    def agg(arm, key):
        vals = [m.get(key) for m in results[arm] if m.get(key) is not None]
        return {
            "mean": statistics.mean(vals),
            "std": statistics.stdev(vals) if len(vals) > 1 else 0.0,
            "per_seed": vals,
        }

    auc_att, auc_abl = agg("attention", "roc_auc"), agg("ablation", "roc_auc")
    deltas = [a - b for a, b in zip(auc_att["per_seed"], auc_abl["per_seed"])]
    summary = {
        "auc_attention": auc_att,
        "auc_ablation": auc_abl,
        "acc_attention": agg("attention", "accuracy"),
        "acc_ablation": agg("ablation", "accuracy"),
        "delta_auc_mean": statistics.mean(deltas),
        "delta_auc_std": statistics.stdev(deltas) if len(deltas) > 1 else 0.0,
        "delta_auc_ci95": _paired_ci95(deltas),
        "delta_auc_per_seed": deltas,
        "train_seeds": train_seeds,
        "n_per_class": args.n_per_class,
        "epochs": args.epochs,
        "variant": args.variant,
        "face_size": args.face_size,
    }
    print(json.dumps(summary))
    with open(ws / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
