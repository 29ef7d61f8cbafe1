from .anchors import all_anchor_centers, decode_boxes, decode_landmarks
from .gaussian import landmark_gaussian_map
from .image import laplacian, normalize_imagenet, resize_bilinear, rgb_to_gray
from .metrics import average_precision, binary_classification_metrics, roc_auc
from .nms import iou_matrix, nms, nms_batched
from .quality import overall_quality, quality_scores
from .umeyama import affine_from_3pts, invert_affine, transform_points, umeyama
from .warp import crop_and_resize, warp_affine

__all__ = [
    "affine_from_3pts",
    "all_anchor_centers",
    "average_precision",
    "binary_classification_metrics",
    "crop_and_resize",
    "decode_boxes",
    "decode_landmarks",
    "invert_affine",
    "iou_matrix",
    "landmark_gaussian_map",
    "laplacian",
    "nms",
    "nms_batched",
    "normalize_imagenet",
    "overall_quality",
    "quality_scores",
    "resize_bilinear",
    "rgb_to_gray",
    "roc_auc",
    "transform_points",
    "umeyama",
    "warp_affine",
]
