"""Visualization utilities.

Capability parity with the reference's scattered matplotlib/cv2 helpers:
detection overlay (``face_detector.py:122-155``), quality overlay
(``quality_checker.py:306-357``), pipeline canvas
(``pipeline.py:292-360``), attention-map visualization
(``landmark_attention.py:132-150``), batch grid (``interface.py:221-266``),
and training-curve plotting (referenced by the reference's module test
``test_all_modules.py:55-61`` although never implemented there — provided
here for real).

All functions return numpy images (H, W, 3) uint8 and optionally save via
cv2 — headless-safe (matplotlib 'Agg').
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

_LANDMARK_NAMES = ("left_eye", "right_eye", "nose", "left_mouth", "right_mouth")
_COLORS = ((66, 133, 244), (52, 168, 83), (251, 188, 5), (234, 67, 53), (154, 64, 219))


def _save(img: np.ndarray, path) -> None:
    import cv2

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


def visualize_detection(
    image: np.ndarray,
    detection: Dict[str, Any],
    save_path=None,
) -> np.ndarray:
    """Draw bbox + 5 landmarks + confidence onto an RGB image."""
    import cv2

    canvas = np.ascontiguousarray(image).astype(np.uint8).copy()
    if detection is not None:
        x1, y1, x2, y2 = [int(v) for v in detection["bbox"]]
        cv2.rectangle(canvas, (x1, y1), (x2, y2), (66, 133, 244), 2)
        for k, (x, y) in enumerate(np.asarray(detection["landmarks"], int)):
            cv2.circle(canvas, (int(x), int(y)), 3, _COLORS[k % 5], -1)
        cv2.putText(
            canvas,
            f"{detection['confidence']:.2f}",
            (x1, max(y1 - 6, 12)),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.5,
            (66, 133, 244),
            1,
        )
    if save_path:
        _save(canvas, save_path)
    return canvas


def visualize_quality(
    image: np.ndarray,
    quality_result: Dict[str, Any],
    save_path=None,
) -> np.ndarray:
    """Overlay per-metric scores + validity verdict."""
    import cv2

    canvas = np.ascontiguousarray(image).astype(np.uint8).copy()
    ok = quality_result.get("is_valid", False)
    color = (52, 168, 83) if ok else (234, 67, 53)
    lines = [f"valid: {ok}  overall: {quality_result.get('overall_score', 0):.2f}"]
    for k, v in quality_result.get("scores", {}).items():
        lines.append(f"{k}: {v:.1f}" if isinstance(v, float) else f"{k}: {v}")
    for i, line in enumerate(lines):
        cv2.putText(canvas, line, (4, 14 + 13 * i), cv2.FONT_HERSHEY_SIMPLEX, 0.38, color, 1)
    if save_path:
        _save(canvas, save_path)
    return canvas


def visualize_attention_map(
    landmarks: np.ndarray,
    image: Optional[np.ndarray] = None,
    size: int = 224,
    sigma: float = 1.5,
    save_path=None,
) -> np.ndarray:
    """High-res landmark-Gaussian heatmap, optionally blended onto the face."""
    import cv2
    import jax.numpy as jnp

    from ..ops.gaussian import landmark_gaussian_map

    amap = landmark_gaussian_map(
        jnp.asarray(landmarks, jnp.float32)[None],
        (size, size),
        sigma=sigma * size / 7.0,  # scale σ to high-res (visualization only)
        normalize="per_sample",
        clip_range=None,
    )
    heat = np.asarray(amap[0, 0])
    heat8 = (np.clip(heat, 0, 1) * 255).astype(np.uint8)
    heat_rgb = cv2.applyColorMap(heat8, cv2.COLORMAP_JET)[:, :, ::-1]
    if image is not None:
        base = cv2.resize(np.asarray(image).astype(np.uint8), (size, size))
        out = (0.55 * base + 0.45 * heat_rgb).astype(np.uint8)
    else:
        out = heat_rgb
    if save_path:
        _save(out, save_path)
    return out


def visualize_pipeline(
    original: np.ndarray,
    output,
    save_path=None,
) -> np.ndarray:
    """Side-by-side canvas: original+detection | aligned face | attention."""
    import cv2

    H = 224
    orig = cv2.resize(np.asarray(original).astype(np.uint8), (H, H))
    det = {
        "bbox": output.bbox * H / max(original.shape[:2])
        if output.bbox is not None
        else np.asarray([0, 0, 1, 1]),
        "landmarks": (output.original_landmarks or np.zeros((5, 2)))
        if output.original_landmarks is None
        else output.original_landmarks * H / max(original.shape[:2]),
        "confidence": output.confidence,
    }
    panel1 = visualize_detection(orig, det if output.success else None)
    panel2 = (
        cv2.resize(output.aligned_face, (H, H))
        if output.aligned_face is not None
        else np.zeros((H, H, 3), np.uint8)
    )
    panel3 = (
        visualize_attention_map(output.landmarks, panel2, size=H)
        if output.landmarks is not None
        else np.zeros((H, H, 3), np.uint8)
    )
    canvas = np.concatenate([panel1, panel2, panel3], axis=1)
    if save_path:
        _save(canvas, save_path)
    return canvas


def visualize_batch(
    images: np.ndarray,
    labels: Optional[Sequence[int]] = None,
    predictions: Optional[Sequence[int]] = None,
    max_images: int = 16,
    denormalize: bool = True,
    save_path=None,
) -> np.ndarray:
    """Grid of batch images with label/pred captions (interface.py:221-266)."""
    import cv2

    from ..data.dataset import IMAGENET_MEAN, IMAGENET_STD

    n = min(len(images), max_images)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    size = 112
    canvas = np.zeros((rows * size, cols * size, 3), np.uint8)
    for i in range(n):
        img = np.asarray(images[i], np.float32)
        if denormalize:
            img = img * IMAGENET_STD + IMAGENET_MEAN
            img = np.clip(img, 0, 1) * 255
        tile = cv2.resize(img.astype(np.uint8), (size, size))
        caption = []
        if labels is not None:
            caption.append(f"y={int(labels[i])}")
        if predictions is not None:
            caption.append(f"p={int(predictions[i])}")
        if caption:
            cv2.putText(tile, " ".join(caption), (3, 13),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, (66, 244, 133), 1)
        r, c = divmod(i, cols)
        canvas[r * size:(r + 1) * size, c * size:(c + 1) * size] = tile
    if save_path:
        _save(canvas, save_path)
    return canvas


def plot_training_curves(history: Dict[str, List[float]], save_path=None):
    """Loss/accuracy/AUC/LR curves from MetricsTracker.history."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    epochs = range(1, len(history.get("train_loss", [])) + 1)

    axes[0, 0].plot(epochs, history.get("train_loss", []), label="train")
    axes[0, 0].plot(epochs, history.get("val_loss", []), label="val")
    axes[0, 0].set_title("loss")
    axes[0, 0].legend()

    axes[0, 1].plot(epochs, history.get("train_acc", []), label="train")
    axes[0, 1].plot(epochs, history.get("val_acc", []), label="val")
    axes[0, 1].set_title("accuracy")
    axes[0, 1].legend()

    axes[1, 0].plot(epochs, history.get("val_auc", []), label="val AUC")
    axes[1, 0].plot(epochs, history.get("val_f1", []), label="val F1")
    axes[1, 0].set_title("val AUC / F1")
    axes[1, 0].legend()

    axes[1, 1].plot(epochs, history.get("lr", []))
    axes[1, 1].set_title("learning rate")
    axes[1, 1].set_yscale("log")

    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=110)
    return fig
