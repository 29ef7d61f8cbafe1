"""HOG + linear-template sliding-window face detector — the dlib-fallback family.

The reference's fallback submission path uses
``dlib.get_frontal_face_detector()`` — a Felzenszwalb-HOG sliding-window
detector scoring a single linear frontal-face template over an image
pyramid (``task(less_cpu_intensive_ver).ipynb`` cell 15,
``detect_and_crop_face_optimized``). This module re-provisions that
capability TPU-natively instead of binding dlib's C++:

- **HOG features are batched XLA ops**: central-difference gradients on
  the VPU, orientation binning as a one-hot weighting (bilinear between
  the two nearest unsigned-orientation bins, the standard HOG recipe),
  cell aggregation as a static reshape-sum, and 2x2-block L2
  normalization — all static shapes, one jit for the whole batch. dlib
  walks each image serially on the CPU.
- **The sliding window is a convolution**: scoring every 80x80 window
  against the learned template is one VALID conv of the (Hb, Wb, 36)
  feature map with a (9, 9, 36) filter — an MXU contraction — rather
  than dlib's explicit window loop.
- **The pyramid is static**: a fixed ladder of (5/6)^k scales (dlib's
  default pyramid_down ratio) over the fixed input canvas, each level a
  static-shape branch of the same jitted program; dlib rebuilds a
  dynamic pyramid per image. One optional 2x upsampled level mirrors the
  reference's ``face_detector(img, 1)`` upsample argument.
- Candidate merging reuses the framework's fixed-size batched NMS
  (``ops/nms.py``) and the ``FaceDetector`` host API, so ``model: "hog"``
  drops into every pipeline that takes a detection config block.

dlib's detector emits boxes only (no landmarks); the reference fallback
then crops a 1.3x-enlarged square and resizes — no alignment
(``get_boundingbox`` in the same cell). For API compatibility this
detector synthesizes the five canonical frontal landmarks at fixed
box-relative positions (the aligner's DEFAULT_REFERENCE_LANDMARKS
fractions), so the downstream Umeyama alignment degenerates to exactly
that crop-and-resize similarity: parity of behavior, one shared
downstream path.

The template is trained in-framework (``fit_hog_template``: linear SVM
via hinge-loss gradient descent with hard-negative mining rounds) on the
same procedural corpus as the other detector families; shipped weights
live in ``weights/hog_synface.msgpack``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import nms_batched
from ..preprocessing.detector import FaceDetector

CELL = 8  # pixels per HOG cell
BINS = 9  # unsigned orientation bins over [0, pi)
WINDOW_CELLS = 10  # detection window = 10x10 cells = 80x80 px
WINDOW = WINDOW_CELLS * CELL
BLOCK_DIM = BINS * 4  # 2x2-cell blocks, L2-normalized
TEMPLATE_BLOCKS = WINDOW_CELLS - 1  # 9x9 block grid inside the window
# A window hit means "an 80 px window holds a face box of ~80/1.25 px
# centered in it" — the context margin the template is trained with.
FACE_IN_WINDOW = 1.25
PYRAMID_RATIO = 5.0 / 6.0  # dlib's default pyramid_down ratio

# Box-relative canonical landmark fractions (aligner.DEFAULT_REFERENCE_LANDMARKS).
_CANONICAL_LM = np.array(
    [(0.31, 0.32), (0.69, 0.32), (0.50, 0.55), (0.35, 0.75), (0.65, 0.75)],
    np.float32,
)


# ---------------------------------------------------------------------------
# HOG features (batched, jittable)
# ---------------------------------------------------------------------------
def hog_cells(gray: jnp.ndarray) -> jnp.ndarray:
    """Per-cell orientation histograms: (B, H, W) gray → (B, H//8, W//8, 9).

    Central-difference gradients (edge-replicated, matching the classic
    HOG/dlib convention of zero gradient contribution at the border),
    unsigned orientation, bilinear soft-assignment between the two
    nearest bins, magnitude-weighted sum over each 8x8 cell.
    """
    g = gray.astype(jnp.float32)
    dx = jnp.pad(g[:, :, 2:] - g[:, :, :-2], ((0, 0), (0, 0), (1, 1)))
    dy = jnp.pad(g[:, 2:, :] - g[:, :-2, :], ((0, 0), (1, 1), (0, 0)))
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx) % jnp.pi  # unsigned: [0, pi)

    binf = ang * (BINS / jnp.pi)  # [0, 9)
    b0 = jnp.floor(binf)
    frac = binf - b0
    b0 = b0.astype(jnp.int32) % BINS
    b1 = (b0 + 1) % BINS
    # One-hot weighting: (B, H, W, 9) votes.
    votes = jax.nn.one_hot(b0, BINS) * (mag * (1.0 - frac))[..., None]
    votes = votes + jax.nn.one_hot(b1, BINS) * (mag * frac)[..., None]

    B, H, W = g.shape
    Hc, Wc = H // CELL, W // CELL
    votes = votes[:, : Hc * CELL, : Wc * CELL]
    cells = votes.reshape(B, Hc, CELL, Wc, CELL, BINS).sum(axis=(2, 4))
    return cells


def hog_blocks(cells: jnp.ndarray) -> jnp.ndarray:
    """2x2-cell block descriptor: (B, Hc, Wc, 9) → (B, Hc-1, Wc-1, 36).

    L2 norm with the Dalal-Triggs 0.2 clip + renormalize."""
    tl = cells[:, :-1, :-1]
    tr = cells[:, :-1, 1:]
    bl = cells[:, 1:, :-1]
    br = cells[:, 1:, 1:]
    block = jnp.concatenate([tl, tr, bl, br], axis=-1)
    norm = jnp.sqrt(jnp.sum(block * block, axis=-1, keepdims=True) + 1e-6)
    block = block / norm
    block = jnp.minimum(block, 0.2)
    norm = jnp.sqrt(jnp.sum(block * block, axis=-1, keepdims=True) + 1e-6)
    return block / norm


def hog_descriptor(gray: jnp.ndarray) -> jnp.ndarray:
    """Full-window descriptor for 80x80 patches: (B, 80, 80) → (B, 2916)."""
    blocks = hog_blocks(hog_cells(gray))
    return blocks.reshape(gray.shape[0], -1)


def _score_map(blocks: jnp.ndarray, template: jnp.ndarray, bias) -> jnp.ndarray:
    """Slide the (9, 9, 36) template over (B, Hb, Wb, 36): → (B, Hs, Ws).

    One VALID conv (MXU contraction) replaces dlib's explicit window loop."""
    out = jax.lax.conv_general_dilated(
        blocks,
        template[..., None],  # (9, 9, 36, 1)
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[..., 0] + bias


def pyramid_sizes(
    canvas: Tuple[int, int], upsample: int = 1, min_side: int = WINDOW
) -> List[Tuple[int, int]]:
    """Static pyramid ladder: (5/6)^k scaled canvas sizes, largest first.

    ``upsample`` prepends 2x-enlarged levels (the reference calls
    ``face_detector(resized_np, 1)`` — one upsample — halving the minimum
    detectable face to ~40 px on the canvas)."""
    H, W = canvas
    sizes: List[Tuple[int, int]] = []
    scale = float(2**upsample)
    while True:
        h, w = int(round(H * scale)), int(round(W * scale))
        if min(h, w) < min_side:
            break
        # Keep cell alignment: snap to CELL multiples so reshape-sum works.
        sizes.append((h - h % CELL, w - w % CELL))
        scale *= PYRAMID_RATIO
    return sizes


class HogFaceDetector(FaceDetector):
    """dlib-equivalent frontal detector behind the FaceDetector host API.

    Shares ``_prepare`` letterboxing, ``batch_detect``/``detect``,
    ``_postprocess`` (keep_top_k, confidence filtering), and
    ``get_face_roi`` with the SCRFD/MTCNN families; only the jitted
    detection graph and the parameter pytree differ. Confidence is the
    logistic of the SVM margin, so the config's default 0.5 confidence
    threshold corresponds to the classic margin>0 decision rule.
    """

    def __init__(
        self,
        confidence_threshold: float = 0.5,
        nms_threshold: float = 0.3,
        keep_top_k: int = 1,
        input_size: Tuple[int, int] = (320, 320),
        max_detections: int = 16,
        params: Optional[Dict[str, Any]] = None,
        pretrained: bool = True,
        upsample: int = 1,
    ):
        self.confidence_threshold = confidence_threshold
        self.nms_threshold = nms_threshold
        self.keep_top_k = keep_top_k
        self.input_size = tuple(input_size)
        self.max_detections = max_detections
        self.model_name = "hog"
        # No cascade stage for the HOG family (the refinement net is a CNN
        # re-scorer; the HOG template has no use for it) — but the shared
        # host API (detect_batch_raw) threads refiner_variables through the
        # jit boundary for every family, so hold the empty tree.
        self.refiner = None
        self.refiner_variables: Dict[str, Any] = {}
        self.upsample = upsample
        self._levels = pyramid_sizes(self.input_size, upsample=upsample)

        if params is not None:
            self.variables = params
        else:
            self.variables = {
                "template": jnp.zeros(
                    (TEMPLATE_BLOCKS, TEMPLATE_BLOCKS, BLOCK_DIM), jnp.float32
                ),
                "bias": jnp.zeros((), jnp.float32),
            }
            from ..preprocessing.detector import default_weights_path

            default = default_weights_path("hog")
            if pretrained and default:
                self.load_weights(default)

        self._detect_jit = jax.jit(self._detect_graph)

    # -- jitted core ------------------------------------------------------
    def _detect_graph(self, variables, refiner_variables, images: jnp.ndarray):
        """images: (B, H, W, 3) uint8/float RGB [0,255] → padded dets.

        ``refiner_variables`` is unused (always the empty tree — no cascade
        for this family) but kept so the base class's jitted call signature
        is uniform across families.
        """
        del refiner_variables
        template = variables["template"]
        bias = variables["bias"]
        gray = jnp.asarray(images, jnp.float32) @ jnp.array(
            [0.299, 0.587, 0.114], jnp.float32
        )

        H0, W0 = self.input_size
        all_scores = []
        all_boxes = []
        for h, w in self._levels:
            lvl = (
                gray
                if (h, w) == (H0, W0)
                else jax.image.resize(gray, (gray.shape[0], h, w), "linear")
            )
            smap = _score_map(hog_blocks(hog_cells(lvl)), template, bias)
            B, Hs, Ws = smap.shape
            # Window at block (bi, bj) covers canvas pixels
            # [bj*8, bj*8+80) x [bi*8, bi*8+80) at this level; shrink by
            # FACE_IN_WINDOW around the center for the tight face box,
            # then rescale to canvas coordinates.
            sy = H0 / h
            sx = W0 / w
            bi, bj = jnp.meshgrid(
                jnp.arange(Hs, dtype=jnp.float32),
                jnp.arange(Ws, dtype=jnp.float32),
                indexing="ij",
            )
            cx = (bj * CELL + WINDOW / 2.0) * sx
            cy = (bi * CELL + WINDOW / 2.0) * sy
            half_w = (WINDOW / FACE_IN_WINDOW / 2.0) * sx
            half_h = (WINDOW / FACE_IN_WINDOW / 2.0) * sy
            boxes = jnp.stack(
                [cx - half_w, cy - half_h, cx + half_w, cy + half_h], axis=-1
            )
            all_scores.append(smap.reshape(B, -1))
            all_boxes.append(
                jnp.broadcast_to(boxes.reshape(1, -1, 4), (B, Hs * Ws, 4))
            )

        scores = jax.nn.sigmoid(jnp.concatenate(all_scores, axis=1))
        boxes = jnp.concatenate(all_boxes, axis=1)

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

        # Synthesized canonical landmarks (see module docstring).
        tl = sel_boxes[..., :2]
        size = sel_boxes[..., 2:] - tl
        lms = tl[:, :, None, :] + jnp.asarray(_CANONICAL_LM) * size[:, :, None, :]
        return {
            "boxes": sel_boxes,
            "scores": jnp.where(valid, sel_scores, 0.0),
            "landmarks": lms,
            "valid": valid,
        }

    def load_weights(self, path: str) -> None:
        from flax import serialization

        with open(path, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        self.variables = {
            "template": jnp.asarray(state["template"], jnp.float32),
            "bias": jnp.asarray(state["bias"], jnp.float32),
        }

    def save_weights(self, path: str) -> None:
        from flax import serialization

        state = {
            "template": np.asarray(self.variables["template"]),
            "bias": np.asarray(self.variables["bias"]),
        }
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(state))


# ---------------------------------------------------------------------------
# Training: linear SVM with hard-negative mining
# ---------------------------------------------------------------------------
def _extract_window(img_gray: np.ndarray, cx: float, cy: float, side: float) -> Optional[np.ndarray]:
    """Resample a square window to 80x80 (bilinear via cv2)."""
    import cv2

    h, w = img_gray.shape
    half = side / 2.0
    x1, y1, x2, y2 = cx - half, cy - half, cx + half, cy + half
    if x1 < 0 or y1 < 0 or x2 > w or y2 > h or side < 8:
        return None
    xi1, yi1, xi2, yi2 = int(x1), int(y1), int(np.ceil(x2)), int(np.ceil(y2))
    patch = img_gray[yi1:yi2, xi1:xi2]
    if patch.size == 0:
        return None
    return cv2.resize(patch, (WINDOW, WINDOW), interpolation=cv2.INTER_LINEAR)


def _svm_fit(X: np.ndarray, y: np.ndarray, l2: float, steps: int, lr: float,
             seed: int = 0) -> Tuple[np.ndarray, float]:
    """Linear SVM by full-batch hinge-loss gradient descent (optax adam)."""
    import optax

    Xj = jnp.asarray(X, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)  # +1 / -1
    # Class-balance the hinge so mining rounds (many negatives) don't
    # swamp the positives.
    wpos = yj.shape[0] / (2.0 * jnp.maximum(jnp.sum(yj > 0), 1.0))
    wneg = yj.shape[0] / (2.0 * jnp.maximum(jnp.sum(yj < 0), 1.0))
    sw = jnp.where(yj > 0, wpos, wneg)

    def loss_fn(params):
        margin = Xj @ params["w"] + params["b"]
        hinge = jnp.maximum(0.0, 1.0 - yj * margin)
        return jnp.mean(sw * hinge) + l2 * jnp.sum(params["w"] ** 2)

    params = {
        "w": jnp.zeros((X.shape[1],), jnp.float32),
        "b": jnp.zeros((), jnp.float32),
    }
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
    return np.asarray(params["w"]), float(params["b"])


def fit_hog_template(
    n_scenes: int = 400,
    scene_size: int = 320,
    seed: int = 0,
    mining_rounds: int = 2,
    negatives_per_scene: int = 8,
    hard_per_scene: int = 4,
    l2: float = 1e-4,
    steps: int = 600,
    lr: float = 0.05,
    log=None,
) -> Dict[str, Any]:
    """Train the frontal-face template on the procedural corpus.

    Positives: GT face boxes (jittered) windowed at FACE_IN_WINDOW
    context. Negatives: random face-free windows, then ``mining_rounds``
    of hard negatives scored by the current template (the classic
    bootstrapping recipe dlib's trainer also uses). Returns the
    HogFaceDetector params dict.
    """
    from ..data.synth_faces import render_scene

    rng = np.random.default_rng(seed)
    scenes = []
    for _ in range(n_scenes):
        img, boxes, _ = render_scene(rng, size=scene_size)
        gray = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
        scenes.append((gray, boxes))

    desc = jax.jit(hog_descriptor)

    def batch_desc(wins: List[np.ndarray]) -> np.ndarray:
        return np.asarray(desc(jnp.asarray(np.stack(wins), jnp.float32)))

    pos_wins: List[np.ndarray] = []
    neg_wins: List[np.ndarray] = []
    for gray, boxes in scenes:
        h, w = gray.shape
        for b in boxes:
            side_face = max(b[2] - b[0], b[3] - b[1])
            cx, cy = (b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0
            for _ in range(2):  # small jitter augmentation
                jcx = cx + rng.uniform(-0.03, 0.03) * side_face
                jcy = cy + rng.uniform(-0.03, 0.03) * side_face
                jside = side_face * FACE_IN_WINDOW * rng.uniform(0.95, 1.05)
                win = _extract_window(gray, jcx, jcy, jside)
                if win is not None:
                    pos_wins.append(win)
        for _ in range(negatives_per_scene):
            side = float(rng.uniform(WINDOW * 0.6, min(h, w) * 0.9))
            cx = float(rng.uniform(side / 2, w - side / 2))
            cy = float(rng.uniform(side / 2, h - side / 2))
            tight = side / FACE_IN_WINDOW / 2.0
            cand = np.array([cx - tight, cy - tight, cx + tight, cy + tight])
            if any(_iou_np(cand, b) > 0.25 for b in boxes):
                continue
            win = _extract_window(gray, cx, cy, side)
            if win is not None:
                neg_wins.append(win)

    Xp = batch_desc(pos_wins)
    Xn = batch_desc(neg_wins)
    if log:
        log(f"positives {len(Xp)}, negatives {len(Xn)}")

    for rnd in range(mining_rounds + 1):
        X = np.concatenate([Xp, Xn])
        y = np.concatenate([np.ones(len(Xp)), -np.ones(len(Xn))])
        w_vec, b_val = _svm_fit(X, y, l2=l2, steps=steps, lr=lr)
        if rnd == mining_rounds:
            break
        # Hard-negative mining: run the current template over the scenes,
        # harvest top-scoring face-free windows.
        params = {
            "template": jnp.asarray(
                w_vec.reshape(TEMPLATE_BLOCKS, TEMPLATE_BLOCKS, BLOCK_DIM)
            ),
            "bias": jnp.asarray(b_val, jnp.float32),
        }
        det = HogFaceDetector(
            confidence_threshold=0.5,
            input_size=(scene_size, scene_size),
            params=params,
            max_detections=32,
            upsample=0,
        )
        hard: List[np.ndarray] = []
        bs = 16
        for i in range(0, len(scenes), bs):
            chunk = scenes[i : i + bs]
            frames = np.stack(
                [np.repeat(g[..., None], 3, axis=-1) for g, _ in chunk]
            )
            out = det.detect_batch_raw(frames.astype(np.float32))
            for bi, (gray, boxes) in enumerate(chunk):
                cnt = 0
                for k in range(out["valid"].shape[1]):
                    if not out["valid"][bi][k] or cnt >= hard_per_scene:
                        continue
                    box = out["boxes"][bi][k]
                    if any(_iou_np(box, b) > 0.25 for b in boxes):
                        continue
                    cx = (box[0] + box[2]) / 2.0
                    cy = (box[1] + box[3]) / 2.0
                    side = float(max(box[2] - box[0], box[3] - box[1])) * FACE_IN_WINDOW
                    win = _extract_window(gray, float(cx), float(cy), side)
                    if win is not None:
                        hard.append(win)
                        cnt += 1
        if hard:
            Xn = np.concatenate([Xn, batch_desc(hard)])
        if log:
            log(f"mining round {rnd}: +{len(hard)} hard negatives (total {len(Xn)})")

    return {
        "template": jnp.asarray(
            w_vec.reshape(TEMPLATE_BLOCKS, TEMPLATE_BLOCKS, BLOCK_DIM)
        ),
        "bias": jnp.asarray(b_val, jnp.float32),
    }


def _iou_np(a: np.ndarray, b: np.ndarray) -> float:
    x1 = max(a[0], b[0])
    y1 = max(a[1], b[1])
    x2 = min(a[2], b[2])
    y2 = min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    ua = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    ub = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    return float(inter / max(ua + ub - inter, 1e-9))
