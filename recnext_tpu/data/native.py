"""ctypes binding for the native C++ image-decoding core (native/recnext_io.cpp).

Builds the shared library on first use (g++ -O3, libjpeg) into native/build/ and
falls back to the PIL path transparently when the toolchain or libjpeg is missing.
This is the native counterpart of the reference's torch-DataLoader + PIL worker
stack (/root/reference/main.py:242-259).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from recnext_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

_ROOT = Path(__file__).resolve().parents[2]
_SRC = _ROOT / "native" / "recnext_io.cpp"
_ABI_VERSION = 3  # must match rn_version() in recnext_io.cpp
# ABI-versioned filename: a prebuilt .so from an older ABI can sit in a fresh
# checkout with mtime >= source; dlopen caches by path in-process so an
# in-place rebuild cannot take effect — a new name per ABI sidesteps both.
_SO = _ROOT / "native" / "build" / f"librecnext_io.v{_ABI_VERSION}.so"
_LIB = None
_FAILED = False


def _build() -> bool:
    _SO.parent.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO),
           "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    # a shipped build dir may carry the .so without the source; use it as-is
    stale = _SRC.exists() and (not _SO.exists()
                               or _SO.stat().st_mtime < _SRC.stat().st_mtime)
    if not _SO.exists() or stale:
        if not _build():
            _FAILED = True
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        lib = None
    # backstop only (e.g. a hand-built stale file under the versioned name);
    # a failed check disables the native path rather than corrupting memory
    if lib is not None and lib.rn_version() != _ABI_VERSION:
        lib = None
    if lib is None:
        _FAILED = True
        return None
    lib.rn_decode_jpeg.restype = ctypes.c_long
    lib.rn_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.rn_batch_decode_crop.restype = ctypes.c_int
    lib.rn_batch_decode_crop.argtypes = [
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32), ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.float32), ctypes.c_int]
    lib.rn_batch_decode_crop_u8.restype = ctypes.c_int
    lib.rn_batch_decode_crop_u8.argtypes = [
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32), ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8), ctypes.c_int]
    _LIB = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def decode_jpeg(data: bytes, min_side: int = 0) -> Optional[np.ndarray]:
    """Decode one JPEG to an RGB uint8 (H, W, 3) array; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    need = lib.rn_decode_jpeg(data, len(data), min_side, None, 0,
                              ctypes.byref(w), ctypes.byref(h))
    if need < 0:
        return None
    buf = np.empty(need, np.uint8)
    got = lib.rn_decode_jpeg(
        data, len(data), min_side,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), need,
        ctypes.byref(w), ctypes.byref(h))
    if got != need:
        return None
    return buf.reshape(h.value, w.value, 3)


def batch_decode_crop(
    blobs: Sequence[bytes],
    crops: np.ndarray,  # (n, 5) float32: cx, cy, cw, ch, flip; cw<=0 -> full image
    size: int,
    n_threads: int = 4,
    filter: str = "bicubic",  # PIL-convention antialiased: bicubic | bilinear
) -> Optional[np.ndarray]:
    """Decode+crop+resize+normalize a batch to float32 NHWC in native threads.

    Crop coords are float source-image coordinates, so PIL resize-then-crop
    geometry is expressible exactly (see loader._native_eval_batches)."""
    lib = get_lib()
    if lib is None:
        return None
    data = b"".join(blobs)
    lengths = np.asarray([len(b) for b in blobs], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths[:-1])]).astype(np.int64)
    n = len(blobs)
    out = np.empty((n, size, size, 3), np.float32)
    fails = lib.rn_batch_decode_crop(
        data, offsets, lengths, n, np.ascontiguousarray(crops, np.float32), size,
        {"bilinear": 0, "bicubic": 1}[filter],
        IMAGENET_MEAN.astype(np.float32), IMAGENET_STD.astype(np.float32),
        out, n_threads)
    if fails:
        return None
    return out


def batch_decode_crop_u8(
    blobs: Sequence[bytes],
    crops: np.ndarray,  # (n, 5) float32: cx, cy, cw, ch, flip; cw<=0 -> full image
    size: int,
    n_threads: int = 4,
    filter: str = "bicubic",
) -> Optional[np.ndarray]:
    """Training fast path: decode + RandomResizedCrop + flip fused natively,
    PIL-rounded uint8 NHWC out — the caller runs RandAugment/jitter/normalize on
    the already-small crop (loader._native_train_batches)."""
    lib = get_lib()
    if lib is None:
        return None
    data = b"".join(blobs)
    lengths = np.asarray([len(b) for b in blobs], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths[:-1])]).astype(np.int64)
    n = len(blobs)
    out = np.empty((n, size, size, 3), np.uint8)
    fails = lib.rn_batch_decode_crop_u8(
        data, offsets, lengths, n, np.ascontiguousarray(crops, np.float32), size,
        {"bilinear": 0, "bicubic": 1}[filter], out, n_threads)
    if fails:
        return None
    return out
