from .fused_mbconv import fold_bn, fold_mbconv_params, fused_mbconv
from .warp_kernel import warp_affine_pallas

__all__ = ["fold_bn", "fold_mbconv_params", "fused_mbconv", "warp_affine_pallas"]
