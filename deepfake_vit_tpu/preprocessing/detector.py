"""Face detection front-end (Stage 1).

Capability parity with reference ``src/preprocessing/face_detector.py``:
``FaceDetector.detect`` returning the best face as
``{bbox(4), landmarks(5,2), confidence, num_faces}`` filtered by a
confidence threshold, batch detection, margin-crop ROI, and a factory
``create_face_detector``. The heavy path is TPU-native: one jitted program
runs the SCRFD network, anchor decode, score filtering, and fixed-size NMS
on a whole batch of frames (the reference loops Python per image through an
ONNX session, ``face_detector.py:96-110``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scrfd import ScrfdDetector
from ..ops.anchors import STRIDES, all_anchor_centers
from ..ops.anchors import decode_boxes, decode_landmarks
from ..ops.nms import nms_batched

# In-framework-trained weights (scripts/train_detector.py --synthetic;
# acceptance-tested in tests/test_detector_trained.py). Loaded by default so
# shipped pipelines detect out of the box — the TPU-native stand-in for the
# reference's pretrained buffalo_l download (face_detector.py:220-227).
_WEIGHTS_DIR = Path(__file__).resolve().parents[1] / "weights"
DEFAULT_WEIGHTS = _WEIGHTS_DIR / "scrfd_synface.msgpack"
DEFAULT_WEIGHTS_BY_MODEL = {
    "scrfd": DEFAULT_WEIGHTS,
    "mtcnn": _WEIGHTS_DIR / "mtcnn_lite_synface.msgpack",
    "hog": _WEIGHTS_DIR / "hog_synface.msgpack",
    "lite": _WEIGHTS_DIR / "lite_synface.msgpack",
    "refine": _WEIGHTS_DIR / "refine_synface.msgpack",
    # Not a detector: the flagship end-task classifier (scripts/predict.py
    # default when --checkpoint is absent) rides the same promotion gate.
    "classifier": _WEIGHTS_DIR / "classifier_synface.msgpack",
}


def default_weights_path(model: str = "scrfd") -> Optional[str]:
    """Path to the committed detector weights, or None if absent.

    ``DFV_WEIGHTS_<MODEL>`` (e.g. ``DFV_WEIGHTS_LITE``) overrides the
    committed path: the promotion gate (``scripts/promote_weights.py``)
    sets it to run the acceptance tests against a STAGED candidate, so a
    file lands in ``deepfake_vit_tpu/weights/`` only after passing — file
    presence in the shipped dir then mechanically implies acceptance
    (the invariant bench.py's ``+L`` sweep gating relies on).
    """
    env = os.environ.get(f"DFV_WEIGHTS_{model.upper()}")
    if env:
        return env if Path(env).exists() else None
    p = DEFAULT_WEIGHTS_BY_MODEL.get(model)
    return str(p) if p is not None and p.exists() else None


def build_detection_net(model: str = "scrfd", dtype=jnp.float32):
    """Detection net factory shared by FaceDetector / FusedPipeline /
    train_detector: 'scrfd' (production, RetinaFace-class) or 'mtcnn'
    (the lightweight second family, models/mtcnn_lite.py)."""
    if model in ("scrfd", "retinaface"):
        return ScrfdDetector(dtype=dtype)
    if model == "mtcnn":
        from ..models.mtcnn_lite import MtcnnLiteDetector

        return MtcnnLiteDetector(dtype=dtype)
    if model == "lite":
        from ..models.lite_detector import LiteDetector

        return LiteDetector(dtype=dtype)
    raise ValueError(f"unknown detector model: {model}")


class FaceDetector:
    """Base detector: SCRFD graph + batched decode/NMS under one jit."""

    def __init__(
        self,
        confidence_threshold: float = 0.5,
        nms_threshold: float = 0.4,
        keep_top_k: int = 1,
        input_size: Tuple[int, int] = (640, 640),
        max_detections: int = 64,
        params: Optional[Dict[str, Any]] = None,
        seed: int = 0,
        pretrained: bool = True,
        model_name: str = "scrfd",
        refine: bool = False,
        refine_threshold: float = 0.7,
        refine_top_k: int = 4,
    ):
        self.confidence_threshold = confidence_threshold
        self.nms_threshold = nms_threshold
        self.keep_top_k = keep_top_k
        self.input_size = tuple(input_size)
        self.max_detections = max_detections
        self.model_name = model_name

        self.model = build_detection_net(model_name)
        if params is None:
            dummy = jnp.zeros((1, *self.input_size, 3), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(seed), dummy)
            self.variables = variables
            default = default_weights_path(model_name)
            if pretrained and default:
                self.load_weights(default)
        else:
            self.variables = params

        # Optional cascade stage-2 (MTCNN R/O-Net semantics,
        # models/refine_net.py): appended INSIDE the same jit graph —
        # contrast the reference's per-stage host re-entry
        # (face_detector.py:33-39, facenet-pytorch MTCNN).
        self.refiner = None
        self.refiner_variables: Dict[str, Any] = {}
        self.refine_threshold = refine_threshold
        self.refine_top_k = refine_top_k
        if refine:
            from ..models.refine_net import REFINE_CROP, RefineNet

            self.refiner = RefineNet()
            dummy_c = jnp.zeros((1, REFINE_CROP, REFINE_CROP, 3), jnp.float32)
            self.refiner_variables = self.refiner.init(
                jax.random.PRNGKey(seed + 1), dummy_c
            )
            rdefault = default_weights_path("refine")
            if pretrained and rdefault:
                self.load_refiner_weights(rdefault)

        centers, strides = all_anchor_centers(self.input_size)
        self._centers = jnp.asarray(centers)
        self._strides = jnp.asarray(strides)
        self._detect_jit = jax.jit(self._detect_graph)

    # -- jitted core ------------------------------------------------------
    def _detect_graph(self, variables, refiner_variables, images: jnp.ndarray):
        """images: (B, H, W, 3) uint8/float raw RGB [0,255]. Returns padded dets."""
        x = (images.astype(jnp.float32) - 127.5) / 128.0
        outs = self.model.apply(variables, x, train=False)
        scores = jnp.concatenate([jax.nn.sigmoid(outs[s]["scores"]) for s in STRIDES], axis=1)
        dist = jnp.concatenate([outs[s]["bbox"] for s in STRIDES], axis=1)
        kps = jnp.concatenate([outs[s]["kps"] for s in STRIDES], axis=1)

        boxes = decode_boxes(self._centers, self._strides, dist)  # (B, N, 4)
        landmarks = decode_landmarks(self._centers, self._strides, kps)  # (B, N, 5, 2)

        idx, valid = nms_batched(
            boxes,
            scores,
            iou_threshold=self.nms_threshold,
            score_threshold=self.confidence_threshold,
            max_outputs=self.max_detections,
        )
        safe = jnp.maximum(idx, 0)
        sel_boxes = jnp.take_along_axis(boxes, safe[..., None], axis=1)
        sel_scores = jnp.take_along_axis(scores, safe, axis=1)
        sel_lms = jnp.take_along_axis(landmarks, safe[..., None, None], axis=1)
        dets = {
            "boxes": sel_boxes,
            "scores": jnp.where(valid, sel_scores, 0.0),
            "landmarks": sel_lms,
            "valid": valid,
        }
        if self.refiner is not None:
            from ..models.refine_net import refine_detections

            dets = refine_detections(
                self.refiner.apply,
                refiner_variables,
                x,
                dets,
                top_k=self.refine_top_k,
                refine_threshold=self.refine_threshold,
            )
        return dets

    # -- host API ----------------------------------------------------------
    def _prepare(self, image: np.ndarray) -> Tuple[np.ndarray, float]:
        """Aspect-preserving resize into the static input canvas.

        uint8 inputs stay uint8 (4x less H2D over a slow link; the f32 cast
        happens on device inside ``_detect_graph``); float inputs keep f32.
        """
        import cv2

        H, W = self.input_size
        h, w = image.shape[:2]
        scale = min(W / w, H / h)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        dtype = np.uint8 if image.dtype == np.uint8 else np.float32
        canvas = np.zeros((H, W, 3), dtype=dtype)
        canvas[:nh, :nw] = resized
        return canvas, scale

    def detect_batch_raw(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        """Batched detection on pre-sized (B, H, W, 3) RGB uint8/float arrays."""
        images = jnp.asarray(images)
        if images.dtype != jnp.uint8:
            images = images.astype(jnp.float32)
        out = self._detect_jit(self.variables, self.refiner_variables, images)
        return jax.device_get(out)

    def detect(self, image: np.ndarray) -> Optional[Dict[str, Any]]:
        """Single RGB image → best face dict or None (reference contract)."""
        results = self.batch_detect([image])
        return results[0]

    def batch_detect(self, images: List[np.ndarray]) -> List[Optional[Dict[str, Any]]]:
        canvases, scales = zip(*(self._prepare(img) for img in images))
        out = self.detect_batch_raw(np.stack(canvases))
        return self._postprocess(out, scales)

    def batch_detect_device(self, images_dev) -> List[Optional[Dict[str, Any]]]:
        """Detection on an already-on-device (B, H, W, 3) buffer whose
        spatial shape equals ``input_size`` (no letterbox, scale = 1) —
        lets callers share ONE host→device frame transfer between
        detection and the downstream quality/align stages."""
        if tuple(images_dev.shape[1:3]) != self.input_size:
            raise ValueError(
                f"device batch {images_dev.shape[1:3]} != input_size {self.input_size}"
            )
        out = self.detect_batch_raw(images_dev)
        return self._postprocess(out, (1.0,) * images_dev.shape[0])

    def _postprocess(
        self, out: Dict[str, np.ndarray], scales
    ) -> List[Optional[Dict[str, Any]]]:
        results: List[Optional[Dict[str, Any]]] = []
        for b, scale in enumerate(scales):
            valid = out["valid"][b]
            n = int(valid.sum())
            if n == 0:
                results.append(None)
                continue
            scores = out["scores"][b][valid]
            order = np.argsort(-scores)[: self.keep_top_k]
            best = order[0]
            boxes = out["boxes"][b][valid] / scale
            lms = out["landmarks"][b][valid] / scale
            results.append(
                {
                    "bbox": boxes[best].astype(np.float32),
                    "landmarks": lms[best].astype(np.float32),
                    "confidence": float(scores[best]),
                    "num_faces": n,
                }
            )
        return results

    def load_weights(self, path: str) -> None:
        """Load converted detector weights (flax msgpack state dict)."""
        from flax import serialization

        with open(path, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        self.variables = serialization.from_state_dict(self.variables, state)

    def load_refiner_weights(self, path: str) -> None:
        """Load cascade stage-2 (RefineNet) weights; requires refine=True."""
        from flax import serialization

        if self.refiner is None:
            raise ValueError("detector built without refine=True")
        with open(path, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        self.refiner_variables = serialization.from_state_dict(
            self.refiner_variables, state
        )

    @staticmethod
    def get_face_roi(
        image: np.ndarray, bbox: np.ndarray, margin: float = 0.2
    ) -> np.ndarray:
        """Margin-expanded crop (reference ``get_face_roi``)."""
        h, w = image.shape[:2]
        x1, y1, x2, y2 = bbox
        mw = (x2 - x1) * margin
        mh = (y2 - y1) * margin
        x1 = int(max(0, x1 - mw))
        y1 = int(max(0, y1 - mh))
        x2 = int(min(w, x2 + mw))
        y2 = int(min(h, y2 + mh))
        return image[y1:y2, x1:x2]


class ScrfdFaceDetector(FaceDetector):
    """Named alias for the production path (parity with RetinaFaceDetector)."""


def create_face_detector(config: Dict[str, Any]) -> FaceDetector:
    """Factory from the preprocessing_config.yaml 'detection' block."""
    model = config.get("model", "scrfd")
    scrfd_cfg = config.get("scrfd", {}) or {}
    kwargs = dict(
        confidence_threshold=config.get("confidence_threshold", 0.5),
        nms_threshold=config.get("nms_threshold", 0.4),
        keep_top_k=config.get("keep_top_k", 1),
        input_size=tuple(scrfd_cfg.get("input_size", (640, 640))),
        max_detections=scrfd_cfg.get("max_detections", 64),
        # Cascade stage-2 toggle (models/refine_net.py) — the reference
        # MTCNN's refinement-stage semantics, thresholds [0.6, 0.7, 0.8]
        # (face_detector.py:33-39), as config keys.
        refine=bool(config.get("refine", False)),
        refine_threshold=config.get("refine_threshold", 0.7),
        refine_top_k=config.get("refine_top_k", 4),
    )
    if model == "mtcnn":
        # The reference's fallback detector family (face_detector.py:12-192)
        # — provided here as the in-framework MTCNN-Lite net
        # (models/mtcnn_lite.py), same host API and decode machinery.
        det = FaceDetector(model_name="mtcnn", **kwargs)
    elif model in ("hog", "dlib"):
        # The reference notebook's fallback detector
        # (task(less_cpu_intensive_ver).ipynb cell 15:
        # dlib.get_frontal_face_detector) — provided as the TPU-native
        # HOG + linear-template detector (models/hog_detector.py).
        from ..models.hog_detector import HogFaceDetector

        det = HogFaceDetector(
            confidence_threshold=kwargs["confidence_threshold"],
            nms_threshold=kwargs["nms_threshold"],
            keep_top_k=kwargs["keep_top_k"],
            input_size=kwargs["input_size"],
            upsample=int(config.get("upsample", 1)),
        )
    elif model in ("scrfd", "retinaface"):
        det = ScrfdFaceDetector(**kwargs)
    else:
        raise ValueError(f"unknown detector model: {model}")
    path = scrfd_cfg.get("pretrained_path")
    if path:
        det.load_weights(path)
    return det
