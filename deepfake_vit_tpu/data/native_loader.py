"""ctypes bindings for the native C++ decode core (``native/dataloader.cc``).

The reference feeds its GPU through torch DataLoader worker processes
(``src/data/dataset.py:218-243``); the TPU framework's host-side equivalent
is a persistent C++ thread pool that decodes, converts BGR→RGB, resizes,
and ImageNet-normalizes face crops straight into a caller-owned NHWC
float32 buffer — no per-image Python objects and no GIL on the decode path.

Build with ``native/build.sh`` (produces ``native/libdfv_dataloader.so``).
When the library is absent everything degrades gracefully to the Python
cv2 path (``is_available()`` gates all callers).
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libdfv_dataloader.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.exists():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None
    lib.dfv_loader_create.argtypes = [ctypes.c_int]
    lib.dfv_loader_create.restype = ctypes.c_void_p
    lib.dfv_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.dfv_loader_destroy.restype = None
    lib.dfv_decode_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.dfv_decode_batch.restype = ctypes.c_int
    lib.dfv_decode_one.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dfv_decode_one.restype = ctypes.c_int
    _lib = lib
    return _lib


def is_available() -> bool:
    """True when the native shared library is built and loadable."""
    return _load() is not None


class NativeDecoder:
    """Persistent decode thread pool over the C ABI.

    ``decode_batch`` returns ``(images, failed)``: an (N, S, S, 3) float32
    NHWC array and an (N,) bool array flagging unreadable files (their
    slots are zero-filled, matching the per-image failure-row semantics of
    the reference's preprocessing loop).
    """

    def __init__(self, num_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                f"native loader not built — run native/build.sh (expected {_LIB_PATH})"
            )
        self._lib = lib
        self._handle = lib.dfv_loader_create(int(num_threads))

    def decode_batch(
        self,
        paths: Sequence[str],
        image_size: int = 224,
        normalize: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(paths)
        images = np.empty((n, image_size, image_size, 3), dtype=np.float32)
        failed = np.zeros((n,), dtype=np.uint8)
        if n == 0:
            return images, failed.astype(bool)
        encoded = [str(p).encode() for p in paths]
        arr = (ctypes.c_char_p * n)(*encoded)
        self._lib.dfv_decode_batch(
            self._handle,
            arr,
            n,
            int(image_size),
            1 if normalize else 0,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            failed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return images, failed.astype(bool)

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.dfv_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover — GC-order dependent
        try:
            self.close()
        except Exception:
            pass
