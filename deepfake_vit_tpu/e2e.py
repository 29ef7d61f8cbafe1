"""Fused end-to-end pipeline: ONE jitted program per batch of frames.

The reference runs detect (ONNX) → quality (cv2) → align (cv2) → classify
(torch) as four host-orchestrated stages per image (``pipeline.py:122-177``
+ ``task.ipynb``). Here the whole chain — SCRFD forward, anchor decode,
fixed-size NMS, best-face selection, Umeyama solve, batched warp, quality
scoring, ImageNet normalization, EfficientNet+attention classification —
compiles into a single XLA program with static shapes: no host↔device
round-trips between stages, full fusion of the elementwise glue, and the
batch dimension shardable over the ``data`` mesh axis.

This is the graph behind the headline faces/sec/chip benchmark
(BASELINE.json north star).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import create_model_from_config
from .models.scrfd import ScrfdDetector
from .ops.anchors import STRIDES, all_anchor_centers, decode_boxes, decode_landmarks
from .ops.image import IMAGENET_MEAN, IMAGENET_STD
from .ops.quality import overall_quality
from .ops.umeyama import transform_points, umeyama
from .ops.warp import _avg_pool2, warp_affine_auto, warp_affine_windowed
from .preprocessing.aligner import DEFAULT_REFERENCE_LANDMARKS, _LANDMARK_ORDER


class FusedPipeline:
    """detect+align+quality+classify as one jittable function.

    ``__call__(detector_vars, model_state, frames)`` with frames
    (B, H, W, 3) float RGB [0,255] returns per-frame results; every frame
    yields exactly one (best) face with a validity flag — static shapes
    throughout.
    """

    def __init__(
        self,
        model_config: Dict[str, Any],
        detection_input_size: Tuple[int, int] = (640, 640),
        output_size: Tuple[int, int] = (224, 224),
        confidence_threshold: float = 0.5,
        reference_landmarks: Optional[Dict[str, Tuple[float, float]]] = None,
        serving_size: Optional[Tuple[int, int]] = None,
        warp_window: int = 160,
        warp_fractional: bool = False,
        warp_tap_mode: str = "legacy",
        dtype=jnp.bfloat16,
        use_fused_backbone: bool = False,
        use_int8_tail: bool = False,
        int8_tail_start: Optional[int] = None,
        int8_act_scales: Optional[list] = None,
        use_s2d_early: bool = False,
        use_int8_detector: bool = False,
        det_act_scales: Optional[Dict[str, float]] = None,
        keep_top_k: int = 1,
        nms_threshold: float = 0.4,
        compute_quality: bool = True,
        detector_arch: str = "scrfd",
    ):
        """serving_size decouples the FRAME resolution from the detection
        canvas: frames enter at serving_size, are average-pooled by the
        (power-of-2) ratio for the SCRFD forward, and alignment warps from
        the ORIGINAL serving-resolution pixels via the windowed warp — the
        reference aligns from the original image too
        (``face_aligner.py:102-128``); round 1 warped from the downscaled
        canvas, losing detail for small faces. Default: serving == detection
        canvas (still windowed-warped when the frame exceeds warp_window).

        keep_top_k > 1 enables MULTI-FACE serving (the reference's
        ``keep_top_k`` config key, preprocessing_config.yaml:9): per frame,
        the top-K NMS survivors are each aligned/scored/classified; outputs
        gain a faces axis (B, K, ...) with a ``face_valid`` mask. K == 1
        keeps the reference's best-face semantics and the flat (B, ...)
        output contract.

        detector_arch selects the detection family: "scrfd" (production)
        or "lite" (S2D-Lite, models/lite_detector.py — the TPU-first
        ultra-light net; same output contract, decode/NMS machinery, and
        acceptance bars, own trained weights)."""
        from .preprocessing.detector import build_detection_net

        self.detector_arch = detector_arch
        self.detector = build_detection_net(detector_arch, dtype=dtype)
        self.model = create_model_from_config(model_config.get("model", {}), dtype=dtype)
        self.dtype = dtype
        self.input_size = tuple(detection_input_size)
        self.serving_size = tuple(serving_size or detection_input_size)
        self.warp_window = warp_window
        # Fractional-scale windowed crop (ops/warp.py::window_geometry_frac):
        # per-face bilinear resample instead of the 2^l block average —
        # lower crop RMSE vs the exact warp in every face-size bin
        # (BASELINE.md round-3 fidelity table), exact when the quad fits.
        self.warp_fractional = warp_fractional
        # Tap-weight construction for the final warp kernel ("legacy" |
        # "uw" | "uw16" | "int8" — ops/pallas/warp_kernel.py): the rank-2
        # MXU modes cut the measured 2/3-of-kernel VPU construction cost;
        # "int8" additionally runs the main matmul at the s8 MXU rate.
        # Any non-legacy mode also switches the crop kernels to their
        # constant-input "mxu" construction (ops/warp.py).
        self.warp_tap_mode = warp_tap_mode
        # Mosaic kernels only lower on TPU; CPU (tests, virtual meshes)
        # falls back to the XLA backbone automatically.
        self.use_fused_backbone = use_fused_backbone and jax.default_backend() == "tpu"
        # Int8 late-stage tail (models/int8_tail.py): s8×s8→s32 MXU matmuls
        # for the late-block 1×1 convs, parity-gated in tests/test_int8_tail.
        self.use_int8_tail = use_int8_tail
        self.int8_tail_start = int8_tail_start
        # Static calibrated activation scales (models/int8_tail.py::
        # calibrate_act_scales, or the calibrate_int8 convenience below):
        # removes the per-matmul max-abs reduction + standalone quantize
        # pass of the dynamic scheme. None → dynamic per-image scales.
        self.int8_act_scales = int8_act_scales
        # Int8 detector graph (models/scrfd_int8.py): the SCRFD 3×3 convs
        # as s8×s8→s32 MXU convolutions — parity-gated in
        # tests/test_scrfd_int8.py. det_act_scales: static calibrated
        # activation scales (calibrate_int8_detector below); None → dynamic.
        if use_int8_detector and detector_arch != "scrfd":
            raise ValueError("use_int8_detector supports the scrfd family only")
        self.use_int8_detector = use_int8_detector
        self.det_act_scales = det_act_scales
        # Quality scoring costs ~3 ms at b128; the reference's inference
        # path (predict, task.ipynb cell 16) runs NO quality check — this
        # flag is the parity-defensible max-throughput knob. Default ON to
        # keep the richer serving contract.
        self.compute_quality = compute_quality
        # S2d-4 early stages (models/s2d_early.py): the 112² stem/stage-1/2
        # portion on compact phase-blocked tensors; parity-gated in
        # tests/test_s2d_early.py. Composes with the int8 tail.
        self.use_s2d_early = use_s2d_early
        self.keep_top_k = int(keep_top_k)
        self.nms_threshold = float(nms_threshold)
        ratio = self.serving_size[0] // self.input_size[0]
        if (
            self.serving_size[0] != self.input_size[0] * ratio
            or self.serving_size[1] != self.input_size[1] * ratio
            or ratio & (ratio - 1)
        ):
            raise ValueError(
                f"serving_size {self.serving_size} must be a power-of-2 "
                f"multiple of detection_input_size {self.input_size}"
            )
        self._pool_ratio = ratio
        # One 2× pool level folds into the detector stem exactly
        # (models/scrfd.py::fold_stem_pool_params): the stem's first conv
        # becomes k6-s4 on 2×-resolution frames, eliminating one NHWC C=3
        # pooling pass (~8 ms at B=128·640² — 3/128 lane utilization).
        self._stem_fold = 2 if ratio >= 2 else 1
        if self._stem_fold > 1:
            if detector_arch == "lite":
                from .models.lite_detector import LiteDetector

                self.detector_folded = LiteDetector(
                    dtype=dtype, stem_pool=self._stem_fold)
            else:
                self.detector_folded = ScrfdDetector(
                    dtype=dtype, stem_pool=self._stem_fold)
        self.output_size = tuple(output_size)
        self.confidence_threshold = confidence_threshold

        centers, strides = all_anchor_centers(self.input_size)
        self._centers = jnp.asarray(centers)
        self._strides = jnp.asarray(strides)

        ref = {**DEFAULT_REFERENCE_LANDMARKS, **(reference_landmarks or {})}
        self.reference = jnp.asarray(
            np.asarray([ref[k] for k in _LANDMARK_ORDER], np.float32)
            * np.asarray([self.output_size[1], self.output_size[0]], np.float32)
        )
        self.forward = jax.jit(self._graph)

    def calibrate_int8(self, model_vars, faces, batch_size: int = 32):
        """Calibrate static int8 activation scales on aligned face crops.

        ``faces``: (N, *output_size, 3) RGB [0, 255] — representative
        aligned faces (e.g. rendered via data/synth_faces.py, or crops
        from a deployment corpus). Stores the scales and re-jits
        ``forward`` so subsequent calls run the static-scale graph.
        """
        from .models.int8_tail import calibrate_act_scales, default_tail_start

        if not self.use_int8_tail:
            raise ValueError("calibrate_int8 requires use_int8_tail=True")
        faces = jnp.asarray(faces, jnp.float32)
        norm = (faces / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        batches = [
            norm[i : i + batch_size].astype(self.dtype)
            for i in range(0, norm.shape[0], batch_size)
        ]
        start = (self.int8_tail_start if self.int8_tail_start is not None
                 else default_tail_start(self.model.variant))
        self.int8_act_scales = calibrate_act_scales(
            self.model.variant,
            model_vars["params"]["feature_extractor"]["backbone"],
            model_vars["batch_stats"]["feature_extractor"]["backbone"],
            batches,
            start_block=start,
        )
        self.forward = jax.jit(self._graph)
        return self.int8_act_scales

    def calibrate_int8_detector(self, det_vars, frames, batch_size: int = 32):
        """Calibrate static int8 activation scales for the detector.

        ``frames``: (N, *serving_size, 3) RGB [0, 255] representative
        SERVING frames — they go through the same pooling + normalization
        the graph applies, so the calibration sees the exact canvas
        tensors. Stores the scales and re-jits ``forward``.
        """
        from .models.scrfd import fold_stem_pool_params
        from .models.scrfd_int8 import calibrate_det_act_scales

        if not self.use_int8_detector:
            raise ValueError("calibrate_int8_detector requires use_int8_detector=True")
        frames = jnp.asarray(frames).astype(self.dtype)
        canvas = frames
        while canvas.shape[1] > self.input_size[0] * self._stem_fold:
            canvas = _avg_pool2(canvas)
        x = (canvas - 127.5) / 128.0
        dv = fold_stem_pool_params(det_vars, self._stem_fold)
        self.det_act_scales = calibrate_det_act_scales(
            dv,
            [x[i : i + batch_size] for i in range(0, x.shape[0], batch_size)],
            stem_pool=self._stem_fold,
        )
        self.forward = jax.jit(self._graph)
        return self.det_act_scales

    def make_sharded(self, mesh):
        """Jit the pipeline over a mesh: frames sharded on 'data', weights
        replicated — BASELINE config 5 (multi-dataset batch sharded across a
        slice). Returns fn(det_vars, model_vars, frames) with sharded outputs."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if mesh.devices.size <= 1:
            # 1-device meshes: explicit shardings are ~150× slower on the
            # axon runtime — plain jit is semantically identical there.
            return self.forward

        repl = NamedSharding(mesh, P())
        batch = NamedSharding(mesh, P("data"))
        out_sh = {
            "has_face": batch,
            "confidence": batch,
            "bbox": batch,
            "landmarks": batch,
            "quality": batch,
            "quality_valid": batch,
            "probs": batch,
            "fake_prob": batch,
            "features": batch,
        }
        if self.keep_top_k > 1:
            out_sh["face_valid"] = batch
        return jax.jit(
            self._graph,
            in_shardings=(repl, repl, batch),
            out_shardings=out_sh,
        )

    def init_variables(self, rng: jax.Array):
        """Initialize both networks (random weights; load real ones on top)."""
        det_vars = self.detector.init(
            rng, jnp.zeros((1, *self.input_size, 3), jnp.float32)
        )
        rng2 = jax.random.fold_in(rng, 1)
        model_vars = self.model.init(
            {"params": rng2, "dropout": rng2},
            jnp.zeros((1, *self.output_size, 3), jnp.float32),
            jnp.zeros((1, 5, 2), jnp.float32),
        )
        return det_vars, model_vars

    def load_variables(
        self,
        rng: jax.Array,
        classifier_checkpoint: Optional[str] = None,
        detector_weights: Optional[str] = "default",
    ):
        """Init then overlay trained weights (framework .ckpt files).

        ``detector_weights="default"`` loads the committed in-framework-
        trained weights for the pipeline's detector family when present
        (pass None to keep random init).
        """
        from flax import serialization

        from .preprocessing.detector import default_weights_path
        from .utils.io_utils import load_checkpoint

        if detector_weights == "default":
            detector_weights = default_weights_path(self.detector_arch)
        det_vars, model_vars = self.init_variables(rng)
        if classifier_checkpoint:
            ckpt = load_checkpoint(classifier_checkpoint)
            model_vars = {
                "params": serialization.from_state_dict(model_vars["params"], ckpt["params"]),
                "batch_stats": serialization.from_state_dict(
                    model_vars["batch_stats"], ckpt["batch_stats"]
                ),
            }
        if detector_weights:
            with open(detector_weights, "rb") as f:
                state = serialization.msgpack_restore(f.read())
            det_vars = serialization.from_state_dict(det_vars, state)
        return det_vars, model_vars

    # ------------------------------------------------------------------
    def _graph(self, det_vars, model_vars, frames: jnp.ndarray):
        """frames: (B, H, W, 3) RGB [0, 255] at SERVING size — uint8 or
        float. uint8 is the preferred serving input: 4× less H2D traffic
        and every frame-side HBM pass runs at the pipeline dtype."""
        B = frames.shape[0]
        # Frame-side compute in the pipeline dtype (bf16 in serving): the
        # warp kernel quantizes pixels to bf16 regardless, so this costs no
        # extra precision — it halves the pool/crop bandwidth.
        frames = frames.astype(self.dtype)

        # 0. Detection canvas: average-pool the serving frames down to
        #    stem_fold× the detection size; the final 2× rides the folded
        #    detector stem (zero pooling pass).
        det_frames = frames
        r = self._pool_ratio
        while det_frames.shape[1] > self.input_size[0] * self._stem_fold:
            det_frames = _avg_pool2(det_frames)

        # 1. Detection network + decode. keep_top_k == 1 (the reference's
        #    best-face semantics) needs only an argmax; K > 1 takes the
        #    top-M candidates through the fixed-size NMS.
        x = (det_frames - 127.5) / 128.0
        if self.use_int8_detector:
            from .models.scrfd import fold_stem_pool_params
            from .models.scrfd_int8 import ScrfdInt8Runner

            dv = fold_stem_pool_params(det_vars, self._stem_fold)
            outs = ScrfdInt8Runner(
                dv, stem_pool=self._stem_fold,
                act_scales=self.det_act_scales, dtype=self.dtype,
            )(x)
        elif self._stem_fold > 1:
            if self.detector_arch == "lite":
                from .models.lite_detector import fold_stem_pool_params_lite as _fold
            else:
                from .models.scrfd import fold_stem_pool_params as _fold

            outs = self.detector_folded.apply(
                _fold(det_vars, self._stem_fold), x, train=False
            )
        else:
            outs = self.detector.apply(det_vars, x, train=False)
        scores = jnp.concatenate(
            [jax.nn.sigmoid(outs[s]["scores"]) for s in STRIDES], axis=1
        )
        dist = jnp.concatenate([outs[s]["bbox"] for s in STRIDES], axis=1)
        kps = jnp.concatenate([outs[s]["kps"] for s in STRIDES], axis=1)

        K = self.keep_top_k
        boxes = decode_boxes(self._centers, self._strides, dist)
        landmarks = decode_landmarks(self._centers, self._strides, kps)
        if K == 1:
            best = jnp.argmax(scores, axis=1)  # (B,)
            conf = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
            bbox = jnp.take_along_axis(boxes, best[:, None, None], axis=1)[:, 0]
            lms = jnp.take_along_axis(
                landmarks, best[:, None, None, None], axis=1
            )[:, 0]
            has_face = conf >= self.confidence_threshold
            frame_idx = None
        else:
            from .ops.nms import nms_batched

            # Static top-M prefilter keeps the NMS O(K·M) instead of O(K·A).
            M = min(max(8 * K, 32), scores.shape[1])
            top_s, top_i = jax.lax.top_k(scores, M)  # (B, M)
            top_boxes = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
            top_lms = jnp.take_along_axis(
                landmarks, top_i[..., None, None], axis=1
            )
            sel, valid = nms_batched(
                top_boxes.astype(jnp.float32), top_s.astype(jnp.float32),
                iou_threshold=self.nms_threshold, max_outputs=K,
            )
            safe = jnp.maximum(sel, 0)
            conf = jnp.take_along_axis(top_s, safe, axis=1)  # (B, K)
            bbox = jnp.take_along_axis(top_boxes, safe[..., None], axis=1)
            lms = jnp.take_along_axis(top_lms, safe[..., None, None], axis=1)
            has_face = valid & (conf >= self.confidence_threshold)
            # Flatten the faces axis into the batch for align/quality/
            # classify; frames are SHARED per K faces via frame_idx (no
            # frame replication).
            conf = conf.reshape(B * K)
            bbox = bbox.reshape(B * K, 4)
            lms = lms.reshape(B * K, 5, 2)
            has_face = has_face.reshape(B * K)
            frame_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), K)

        # Canvas → serving coords (pixel centers: u_s = r·u + (r−1)/2), so
        # alignment reads original-resolution pixels and bbox/face-size
        # checks are in original pixels like the reference's.
        if r > 1:
            shift = 0.5 * (r - 1)
            bbox = bbox * r + shift
            lms = lms * r + shift

        # 2. Alignment: batched Umeyama + warp from the serving frames.
        ref = jnp.broadcast_to(self.reference, lms.shape)
        tform = umeyama(lms, ref)
        if min(self.serving_size) > self.warp_window:
            aligned = warp_affine_windowed(
                frames, tform, self.output_size, window=self.warp_window,
                frame_indices=frame_idx, fractional=self.warp_fractional,
                tap_construction=self.warp_tap_mode,
            )
        else:
            src = frames if frame_idx is None else jnp.take(frames, frame_idx, axis=0)
            aligned = warp_affine_auto(src, tform, self.output_size,
                                       tap_construction=self.warp_tap_mode)
        aligned_lms = transform_points(tform, lms)

        # 3. Quality scoring on the aligned face (fused). Skippable: the
        #    reference's inference path runs no quality check.
        if self.compute_quality:
            quality, q_valid, _ = overall_quality(aligned, aligned_lms, bbox, conf)
        else:
            quality = jnp.ones_like(conf)
            q_valid = jnp.ones_like(conf, dtype=bool)

        # 4. Classification. The bandwidth-bound early backbone stages run
        #    in the fused Pallas kernels (models/fused_backbone.py); the
        #    late stages + attention + head stay on XLA. BN folding happens
        #    on the traced params — constant-folded by XLA after jit.
        norm = (aligned / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        if self.use_fused_backbone:
            from .models.fused_backbone import FusedBackboneRunner

            runner = FusedBackboneRunner(
                self.model.variant,
                model_vars["params"]["feature_extractor"]["backbone"],
                model_vars["batch_stats"]["feature_extractor"]["backbone"],
                image_size=self.output_size[0],
            )
            x_tail = runner(norm.astype(jnp.bfloat16))
            logits, features = self.model.apply(
                model_vars, x_tail, aligned_lms, train=False,
                return_features=True, backbone_start_block=runner.tail_start,
            )
        elif self.use_int8_tail or self.use_s2d_early:
            from .models.efficientnet import EfficientNetBackbone, block_args
            from .models.int8_tail import Int8TailRunner, default_tail_start

            bbp = model_vars["params"]["feature_extractor"]["backbone"]
            bbs = model_vars["batch_stats"]["feature_extractor"]["backbone"]
            x, start_block = norm, 0
            if self.use_s2d_early:
                from .models.s2d_early import S2DEarlyRunner

                s2d = S2DEarlyRunner(self.model.variant, bbp, bbs,
                                     image_size=self.output_size[0])
                x, start_block = s2d(x), s2d.resume_block
            if self.use_int8_tail:
                start = (self.int8_tail_start if self.int8_tail_start is not None
                         else default_tail_start(self.model.variant))
                backbone = EfficientNetBackbone(
                    variant=self.model.variant, capture_indices=(start - 1,),
                    dtype=jnp.bfloat16,
                )
                _, inter = backbone.apply(
                    {"params": bbp, "batch_stats": bbs}, x, train=False,
                    return_maps=True, return_intermediate=True,
                    start_block=start_block,
                )
                x = Int8TailRunner(self.model.variant, bbp, bbs,
                                   start_block=start,
                                   act_scales=self.int8_act_scales)(inter[start - 1])
                start_block = len(block_args(self.model.variant))
            logits, features = self.model.apply(
                model_vars, x, aligned_lms, train=False,
                return_features=True, backbone_start_block=start_block,
            )
        else:
            logits, features = self.model.apply(
                model_vars, norm, aligned_lms, train=False, return_features=True
            )
        probs = jax.nn.softmax(logits, axis=-1)

        out = {
            "has_face": has_face,
            "confidence": conf,
            "bbox": bbox,
            "landmarks": aligned_lms,
            "quality": quality,
            "quality_valid": q_valid,
            "probs": probs,
            "fake_prob": jnp.where(has_face, probs[:, 1], 0.0),
            "features": features,
        }
        if K > 1:
            # Unflatten the faces axis: (B·K, ...) → (B, K, ...) and expose
            # the validity mask under its config name.
            out = {
                k: v.reshape(B, K, *v.shape[1:]) for k, v in out.items()
            }
            out["face_valid"] = out["has_face"]
        return out

    # ------------------------------------------------------------------
    def predict_clip(self, det_vars, model_vars, frames: np.ndarray, threshold: float = 0.5):
        """Clip-level aggregation: mean fake-prob over frames with faces."""
        out = jax.device_get(self.forward(det_vars, model_vars, jnp.asarray(frames, jnp.float32)))
        mask = out["has_face"].astype(np.float32)
        denom = max(mask.sum(), 1.0)
        fake = float((out["fake_prob"] * mask).sum() / denom)
        return {
            "label": int(fake >= threshold and mask.sum() > 0),
            "fake_prob": fake,
            "num_faces": int(mask.sum()),
            "frame_probs": out["fake_prob"].tolist(),
        }
