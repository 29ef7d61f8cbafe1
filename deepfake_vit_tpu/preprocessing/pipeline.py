"""Preprocessing pipeline (Stage 1): detect → quality → align → save.

Capability parity with reference ``src/preprocessing/pipeline.py:20-425``:
``PreprocessingOutput`` record (aligned face, landmarks, quality, bbox,
confidence, tform, ids/labels) with a model-input conversion; pipeline
``process_image`` where invalid quality is *flagged but still processed*
(pipeline.py:149-151); disk layout faces/ landmarks/ metadata/ with
``{dataset}_{label}_{image_id}`` naming; load_output; statistics
aggregation; and the YAML factory.

TPU-native difference: ``process_batch`` is the primary path — detection,
quality scoring, and alignment each run once as batched jitted programs
over the whole batch instead of per-image Python (reference
pipeline.py:179-202 loops process_image).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from .aligner import FaceAligner, NormalizationProcessor
from .detector import FaceDetector, create_face_detector
from .quality_checker import QualityChecker


@dataclass
class PreprocessingOutput:
    """One processed face — the Stage-1 → Stage-2 on-disk/memory contract."""

    aligned_face: Optional[np.ndarray] = None  # (H, W, 3) uint8 RGB
    landmarks: Optional[np.ndarray] = None     # (5, 2) aligned-image coords
    original_landmarks: Optional[np.ndarray] = None
    bbox: Optional[np.ndarray] = None
    confidence: float = 0.0
    quality_score: float = 0.0
    quality_details: Dict[str, Any] = field(default_factory=dict)
    tform: Optional[np.ndarray] = None
    image_id: Optional[str] = None
    dataset: Optional[str] = None
    label: Optional[str] = None
    success: bool = False
    failure_reason: Optional[str] = None

    def to_model_input(self, normalize: bool = True) -> Dict[str, np.ndarray]:
        """Aligned face → normalized NHWC float + landmarks (model contract)."""
        img = np.asarray(self.aligned_face, dtype=np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if normalize:
            proc = NormalizationProcessor()
            img = (img - proc.mean) / proc.std
        return {
            "image": img,
            "landmarks": np.asarray(self.landmarks, dtype=np.float32),
        }


class PreprocessingPipeline:
    def __init__(self, config: Dict[str, Any]):
        self.config = config
        self.detector: FaceDetector = create_face_detector(config.get("detection", {}))
        align_cfg = config.get("alignment", {})
        self.aligner = FaceAligner(
            output_size=tuple(align_cfg.get("output_size", (224, 224))),
            reference_landmarks=align_cfg.get("reference_landmarks"),
            method=align_cfg.get("method", "similarity"),
            border_value=float(align_cfg.get("border_value", 0)),
            warp_window=align_cfg.get("warp_window"),
            warp_fractional=bool(align_cfg.get("warp_fractional", True)),
        )
        self.quality_checker = QualityChecker(config.get("quality", {}))
        pipe_cfg = config.get("pipeline", {})
        norm_cfg = pipe_cfg.get("normalize", {})
        self.normalizer = NormalizationProcessor(
            mean=tuple(norm_cfg.get("mean", (0.485, 0.456, 0.406))),
            std=tuple(norm_cfg.get("std", (0.229, 0.224, 0.225))),
        )
        self.save_format = pipe_cfg.get("save_format", "png")
        self.jpg_quality = int(pipe_cfg.get("jpg_quality", 95))
        self._stats: List[PreprocessingOutput] = []
        self._fused_jit = None

    # ------------------------------------------------------------------
    def _get_fused(self):
        """ONE jitted detect→(best-face select)→quality→align graph.

        The modular path costs a device dispatch + host sync per stage —
        three round trips per batch, which on a high-latency link (the dev
        tunnel's ~0.3 s RTT) dominates the actual compute. This graph is
        the whole per-batch device work in ONE dispatch with ONE host
        pull, for the uniform-corpus case where the frames already match
        the detection canvas (scale = 1, no letterbox). Numerics are
        identical to the modular stages — it calls the same stage
        functions under one trace.
        """
        if self._fused_jit is not None:
            return self._fused_jit
        import jax.numpy as jnp

        from ..ops.quality import overall_quality

        detector = self.detector
        aligner = self.aligner
        thresholds = (
            dict(self.quality_checker.thresholds)
            if self.quality_checker.enabled else None
        )

        # The fused graph closes over the (possibly empty) refiner tree —
        # cascade refinement rides inside the one dispatch when enabled.
        refiner_vars = detector.refiner_variables

        def graph(det_vars, frames):
            out = detector._detect_graph(det_vars, refiner_vars, frames)
            # Best face per frame: argmax score among valid — the same
            # top-1 the host-side argsort picks (first max wins ties).
            masked = jnp.where(out["valid"], out["scores"], -jnp.inf)
            best = jnp.argmax(masked, axis=1)

            def take(a):
                idx = best.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.take_along_axis(a, idx, axis=1)[:, 0]

            bbox = take(out["boxes"])
            lms = take(out["landmarks"])
            conf = take(out["scores"])
            num_faces = out["valid"].sum(axis=1)
            aligned, aligned_lms, tforms = aligner._align_graph(frames, lms)
            res = {
                "bbox": bbox, "landmarks": lms, "confidence": conf,
                "num_faces": num_faces,
                "aligned": jnp.clip(aligned, 0.0, 255.0).astype(jnp.uint8),
                "aligned_lms": aligned_lms, "tforms": tforms,
            }
            if thresholds is not None:
                overall, _, raw = overall_quality(
                    frames.astype(jnp.float32), lms, bbox, conf, thresholds
                )
                res["q_overall"] = overall
                res["q_raw"] = {k: raw[k] for k in (
                    "face_size", "blur", "brightness", "contrast",
                    "occlusion", "detection_confidence",
                )}
            return res

        self._fused_jit = jax.jit(graph)
        return self._fused_jit

    # ------------------------------------------------------------------
    def process_image(
        self,
        image: np.ndarray,
        image_id: Optional[str] = None,
        dataset: Optional[str] = None,
        label: Optional[str] = None,
    ) -> PreprocessingOutput:
        """Single RGB uint8 image → PreprocessingOutput."""
        return self.process_batch([image], [image_id], [dataset], [label])[0]

    def process_batch(
        self,
        images: Sequence[np.ndarray],
        image_ids: Optional[Sequence[Optional[str]]] = None,
        datasets: Optional[Sequence[Optional[str]]] = None,
        labels: Optional[Sequence[Optional[str]]] = None,
    ) -> List[PreprocessingOutput]:
        n = len(images)
        image_ids = image_ids or [None] * n
        datasets = datasets or [None] * n
        labels = labels or [None] * n

        # Uniform corpora whose frames already match the detection canvas
        # (e.g. a 320² corpus with a 320² canvas) run the whole batch as
        # ONE fused device program — one uint8 upload, one dispatch, one
        # host pull (see _get_fused). Mixed-shape batches fall back to the
        # modular per-stage path below (detection letterboxes per frame;
        # quality/align still upload once per shape group).
        H, W = self.detector.input_size
        if n and all(np.asarray(im).shape == (H, W, 3) for im in images):
            return self._process_batch_fused(images, image_ids, datasets, labels)
        detections = self.detector.batch_detect(list(images))

        outputs: List[PreprocessingOutput] = []
        det_idx: List[int] = []
        for i, det in enumerate(detections):
            out = PreprocessingOutput(
                image_id=image_ids[i], dataset=datasets[i], label=labels[i]
            )
            if det is None:
                out.success = False
                out.failure_reason = "no_face_detected"
            else:
                out.bbox = det["bbox"]
                out.original_landmarks = det["landmarks"]
                out.confidence = det["confidence"]
                det_idx.append(i)
            outputs.append(out)

        if det_idx:
            # Quality + alignment grouped by source image shape so every
            # device call is BATCHED with static shapes (uniform-size corpora
            # collapse to one call per stage per batch). Per-image quality
            # calls each cost a tunnel dispatch + device_get sync — measured
            # ~0.6 img/s end to end before batching. Invalid quality is
            # flagged but still processed (reference pipeline.py:149-151).
            by_shape: Dict[tuple, List[int]] = {}
            for i in det_idx:
                by_shape.setdefault(np.asarray(images[i]).shape, []).append(i)
            for shape, idxs in by_shape.items():
                # ONE host→device transfer per shape group, in the source
                # dtype (uint8 corpora ride the link at 1 byte/px — over the
                # dev tunnel at ~35 MB/s the f32 triple-upload this replaces
                # was ~7 s per 64-batch of 320² frames). Quality and align
                # both read the same device buffer; the f32 casts happen on
                # device inside their jitted graphs.
                imgs = jax.device_put(
                    np.stack([np.asarray(images[i]) for i in idxs])
                )
                lms = np.stack([outputs[i].original_landmarks for i in idxs])
                if self.quality_checker.enabled:
                    qs = self.quality_checker.check_quality_batch(
                        imgs,
                        lms,
                        np.stack([outputs[i].bbox for i in idxs]),
                        np.asarray([outputs[i].confidence for i in idxs], np.float32),
                    )
                    for k, i in enumerate(idxs):
                        outputs[i].quality_score = qs[k]["overall_score"]
                        outputs[i].quality_details = qs[k]
                else:
                    for i in idxs:
                        outputs[i].quality_score = 1.0
                        outputs[i].quality_details = {
                            "is_valid": True, "overall_score": 1.0,
                            "scores": {}, "reasons": [],
                        }
                # uint8 comes back from the device directly (clip + truncate
                # in the jitted graph) — a 4× lighter device→host pull.
                aligned, aligned_lms, tforms = self.aligner.align_batch(
                    imgs, lms, out_uint8=True
                )
                for k, i in enumerate(idxs):
                    outputs[i].aligned_face = aligned[k]
                    outputs[i].landmarks = aligned_lms[k]
                    outputs[i].tform = tforms[k]
                    outputs[i].success = True

        self._stats.extend(outputs)
        return outputs

    def _process_batch_fused(
        self,
        images: Sequence[np.ndarray],
        image_ids: Sequence[Optional[str]],
        datasets: Sequence[Optional[str]],
        labels: Sequence[Optional[str]],
    ) -> List[PreprocessingOutput]:
        """Uniform-shape batch through the one-dispatch fused graph."""
        frames = np.stack([np.asarray(im) for im in images])
        res = jax.device_get(
            self._get_fused()(self.detector.variables, jax.device_put(frames))
        )

        qc = self.quality_checker
        outputs: List[PreprocessingOutput] = []
        for i in range(len(images)):
            out = PreprocessingOutput(
                image_id=image_ids[i], dataset=datasets[i], label=labels[i]
            )
            if int(res["num_faces"][i]) == 0:
                out.success = False
                out.failure_reason = "no_face_detected"
                outputs.append(out)
                continue
            out.bbox = res["bbox"][i].astype(np.float32)
            out.original_landmarks = res["landmarks"][i].astype(np.float32)
            out.confidence = float(res["confidence"][i])
            if qc.enabled:
                scores = {k: float(res["q_raw"][k][i]) for k in res["q_raw"]}
                reasons = qc._reasons(scores)
                out.quality_score = float(res["q_overall"][i])
                out.quality_details = {
                    "is_valid": not reasons,
                    "overall_score": out.quality_score,
                    "scores": scores,
                    "reasons": reasons,
                }
            else:
                out.quality_score = 1.0
                out.quality_details = {
                    "is_valid": True, "overall_score": 1.0,
                    "scores": {}, "reasons": [],
                }
            out.aligned_face = res["aligned"][i]
            out.landmarks = res["aligned_lms"][i]
            out.tform = res["tforms"][i]
            out.success = True
            outputs.append(out)

        self._stats.extend(outputs)
        return outputs

    # ------------------------------------------------------------------
    def save_output(self, output: PreprocessingOutput, base_dir: Path | str) -> Dict[str, str]:
        """Write faces/ landmarks/ metadata/ artifacts; returns relative paths."""
        import cv2

        base = Path(base_dir)
        stem = f"{output.dataset}_{output.label}_{output.image_id}"
        paths = {}

        faces_dir = base / "faces"
        lm_dir = base / "landmarks"
        meta_dir = base / "metadata"
        for d in (faces_dir, lm_dir, meta_dir):
            d.mkdir(parents=True, exist_ok=True)

        face_path = faces_dir / f"{stem}.{self.save_format}"
        bgr = cv2.cvtColor(output.aligned_face, cv2.COLOR_RGB2BGR)
        if self.save_format == "jpg":
            cv2.imwrite(str(face_path), bgr, [cv2.IMWRITE_JPEG_QUALITY, self.jpg_quality])
        else:
            cv2.imwrite(str(face_path), bgr)
        paths["face_path"] = str(face_path.relative_to(base))

        lm_path = lm_dir / f"{stem}.npy"
        np.save(lm_path, output.landmarks)
        paths["landmark_path"] = str(lm_path.relative_to(base))

        meta_path = meta_dir / f"{stem}.json"
        meta = {
            "image_id": output.image_id,
            "dataset": output.dataset,
            "label": output.label,
            "bbox": _tolist(output.bbox),
            "confidence": float(output.confidence),
            "quality_score": float(output.quality_score),
            "quality_details": _jsonable(output.quality_details),
            "tform": _tolist(output.tform),
            "original_landmarks": _tolist(output.original_landmarks),
        }
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=2)
        paths["metadata_path"] = str(meta_path.relative_to(base))
        return paths

    def load_output(self, base_dir: Path | str, stem: str) -> PreprocessingOutput:
        import cv2

        base = Path(base_dir)
        face_path = base / "faces" / f"{stem}.{self.save_format}"
        bgr = cv2.imread(str(face_path))
        if bgr is None:
            raise FileNotFoundError(face_path)
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        landmarks = np.load(base / "landmarks" / f"{stem}.npy")
        with open(base / "metadata" / f"{stem}.json") as f:
            meta = json.load(f)
        return PreprocessingOutput(
            aligned_face=rgb,
            landmarks=landmarks,
            original_landmarks=_toarr(meta.get("original_landmarks")),
            bbox=_toarr(meta.get("bbox")),
            confidence=meta.get("confidence", 0.0),
            quality_score=meta.get("quality_score", 0.0),
            quality_details=meta.get("quality_details", {}),
            tform=_toarr(meta.get("tform")),
            image_id=meta.get("image_id"),
            dataset=meta.get("dataset"),
            label=meta.get("label"),
            success=True,
        )

    # ------------------------------------------------------------------
    def get_statistics(self) -> Dict[str, Any]:
        total = len(self._stats)
        success = [o for o in self._stats if o.success]
        valid = [o for o in success if o.quality_details.get("is_valid", True)]
        qs = [o.quality_score for o in success]
        return {
            "total_processed": total,
            "successful": len(success),
            "failed": total - len(success),
            "success_rate": len(success) / total if total else 0.0,
            "quality_valid": len(valid),
            "quality_mean": float(np.mean(qs)) if qs else 0.0,
            "quality_std": float(np.std(qs)) if qs else 0.0,
            "failure_reasons": _count(
                o.failure_reason for o in self._stats if not o.success
            ),
        }

    def reset_statistics(self) -> None:
        self._stats = []


def _count(items) -> Dict[str, int]:
    out: Dict[str, int] = {}
    for it in items:
        key = str(it)
        out[key] = out.get(key, 0) + 1
    return out


def _tolist(arr):
    return None if arr is None else np.asarray(arr).tolist()


def _toarr(lst):
    return None if lst is None else np.asarray(lst, dtype=np.float32)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    return obj


def create_pipeline_from_config(config_path: str | Path) -> PreprocessingPipeline:
    """YAML factory (reference ``pipeline.py:409-425``)."""
    import yaml

    with open(config_path) as f:
        config = yaml.safe_load(f)
    return PreprocessingPipeline(config)
