"""Pool attention-ablation runs into one paired ΔAUC analysis.

Each input is a summary JSON written by experiment_attention_ablation.py
(or the equivalent docs/ablation_r3_seeds.json record). Runs are poolable
because pairing is WITHIN train seed — both arms of a pair share the same
corpus, splits, and init seed — and every run here used the identical
protocol (b0, 600/class, 224² faces, 35 epochs). Prints one pooled
summary JSON with the paired 95% CI (t-distribution) on the mean ΔAUC,
the decisive number for the HybridAttention claim (reference design
intent: src/feature_extraction/landmark_attention.py:244-310).

Usage:
    python scripts/aggregate_ablation.py docs/ablation_r3_seeds.json \
        outputs/ablation_r4/summary.json
"""

import json
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from experiment_attention_ablation import _paired_ci95  # noqa: E402


def pool(paths):
    seeds, deltas, att, abl = [], [], [], []
    for p in paths:
        s = json.load(open(p))
        run_seeds = s["train_seeds"]
        if set(run_seeds) & set(seeds):
            raise SystemExit(f"{p}: train seeds {run_seeds} overlap an "
                             "earlier run — pairs must be independent")
        seeds += run_seeds
        deltas += s["delta_auc_per_seed"]
        # Two poolable schemas: the attention-ablation summary
        # (auc_attention/auc_ablation) and the generic knob-A/B summary
        # from experiment_pipeline_ab.py (auc_treat/auc_control) — in both,
        # delta = first − second.
        a = s.get("auc_attention") or s["auc_treat"]
        b = s.get("auc_ablation") or s["auc_control"]
        att += a["per_seed"]
        abl += b["per_seed"]
    lo, hi = _paired_ci95(deltas)
    return {
        "n_pairs": len(deltas),
        "train_seeds": seeds,
        "auc_attention_mean": statistics.mean(att),
        "auc_ablation_mean": statistics.mean(abl),
        "delta_auc_mean": statistics.mean(deltas),
        "delta_auc_std": statistics.stdev(deltas),
        "delta_auc_ci95": [lo, hi],
        "delta_auc_per_seed": deltas,
        "separable_from_zero": bool(lo > 0.0 or hi < 0.0),
    }


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    print(json.dumps(pool(sys.argv[1:]), indent=2))
