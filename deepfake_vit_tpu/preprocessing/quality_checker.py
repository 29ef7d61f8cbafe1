"""Quality checking (Stage 1 host API over the fused ops).

Capability parity with reference ``src/preprocessing/quality_checker.py``:
``check_quality(image, landmarks, detection_info)`` → ``{is_valid,
overall_score, scores, reasons}`` with the 5 checks + confidence and the
fixed weight vector. The math lives in ``ops.quality`` as one jitted batch
graph; this class adds threshold bookkeeping, reason strings, and a batch
API the reference lacks.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.quality import DEFAULT_THRESHOLDS


class QualityChecker:
    def __init__(self, config: Optional[Dict[str, Any]] = None):
        cfg = config or {}
        self.enabled = cfg.get("enabled", True)
        self.thresholds = {
            "min_face_size": float(cfg.get("min_face_size", DEFAULT_THRESHOLDS["min_face_size"])),
            "max_face_size": float(cfg.get("max_face_size", DEFAULT_THRESHOLDS["max_face_size"])),
            "blur_threshold": float(cfg.get("blur_threshold", DEFAULT_THRESHOLDS["blur_threshold"])),
            "min_brightness": float(cfg.get("min_brightness", DEFAULT_THRESHOLDS["min_brightness"])),
            "max_brightness": float(cfg.get("max_brightness", DEFAULT_THRESHOLDS["max_brightness"])),
            "min_contrast": float(cfg.get("min_contrast", DEFAULT_THRESHOLDS["min_contrast"])),
            "occlusion_threshold": float(
                cfg.get("occlusion_threshold", DEFAULT_THRESHOLDS["occlusion_threshold"])
            ),
        }
        self.check_occlusion = cfg.get("check_occlusion", True)
        import jax

        from ..ops.quality import overall_quality

        th = dict(self.thresholds)
        self._quality_jit = jax.jit(
            lambda im, lm, bb, cf: overall_quality(im, lm, bb, cf, th)
        )

    def check_quality_batch(
        self,
        images: np.ndarray,
        landmarks: np.ndarray,
        bboxes: np.ndarray,
        confidences: np.ndarray,
    ) -> List[Dict[str, Any]]:
        """Batched quality check: (B,H,W,3) RGB [0,255] → list of result dicts."""
        overall, is_valid, raw = self._quality_jit(
            jnp.asarray(images, jnp.float32),
            jnp.asarray(landmarks, jnp.float32),
            jnp.asarray(bboxes, jnp.float32),
            jnp.asarray(confidences, jnp.float32),
        )
        overall = np.asarray(overall)
        raw = {k: np.asarray(v) for k, v in raw.items()}

        results = []
        for i in range(len(overall)):
            scores = {k: float(raw[k][i]) for k in
                      ("face_size", "blur", "brightness", "contrast", "occlusion",
                       "detection_confidence")}
            reasons = self._reasons(scores)
            results.append(
                {
                    # Reference semantics: valid iff no reasons (quality_checker.py:108).
                    "is_valid": (not reasons) if self.enabled else True,
                    "overall_score": float(overall[i]),
                    "scores": scores,
                    "reasons": reasons,
                }
            )
        return results

    def check_quality(
        self,
        image: np.ndarray,
        landmarks: np.ndarray,
        detection_info: Dict[str, Any],
    ) -> Dict[str, Any]:
        """Single-face API (reference contract ``quality_checker.py:49-130``)."""
        if not self.enabled:
            return {"is_valid": True, "overall_score": 1.0, "scores": {}, "reasons": []}
        return self.check_quality_batch(
            np.asarray(image, np.float32)[None],
            np.asarray(landmarks, np.float32)[None],
            np.asarray(detection_info["bbox"], np.float32)[None],
            np.asarray([detection_info.get("confidence", 1.0)], np.float32),
        )[0]

    def _reasons(self, scores: Dict[str, float]) -> List[str]:
        th = self.thresholds
        reasons = []
        fs = scores["face_size"]
        if not (th["min_face_size"] <= fs <= th["max_face_size"]):
            reasons.append(f"Face size out of range: {fs:.0f}px")
        if scores["blur"] < th["blur_threshold"]:
            reasons.append(f"Image too blurry: {scores['blur']:.1f}")
        if not (th["min_brightness"] <= scores["brightness"] <= th["max_brightness"]):
            reasons.append(f"Brightness out of range: {scores['brightness']:.1f}")
        if scores["contrast"] < th["min_contrast"]:
            reasons.append(f"Contrast too low: {scores['contrast']:.1f}")
        if self.check_occlusion and scores["occlusion"] < th["occlusion_threshold"]:
            reasons.append(f"Face occlusion detected: {scores['occlusion']:.2f}")
        return reasons
