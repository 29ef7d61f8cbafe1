from .warp_kernel import warp_affine_pallas

__all__ = ["warp_affine_pallas"]
