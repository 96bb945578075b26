"""ctypes binding for the native (C++) host-runtime helpers.

Loads `native/libanimateportrait_native.so` (built by `make -C native`);
every entry point has a pure-numpy fallback so the package works unbuilt.
"""
from __future__ import annotations

import ctypes
import functools
import os

import numpy as np

_SO_PATHS = (
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native",
        "libanimateportrait_native.so"),
    "libanimateportrait_native.so",
)


@functools.lru_cache(maxsize=1)
def _lib():
    for p in _SO_PATHS:
        try:
            lib = ctypes.CDLL(p)
            break
        except OSError:
            lib = None
    if lib is None:
        return None
    lib.assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float)]
    lib.float_to_pcm16.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int16)]
    if hasattr(lib, "decode_image"):
        lib.image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.decode_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    return lib


def available() -> bool:
    return _lib() is not None


def assemble_batch(imgs: list[np.ndarray], crop_xy: np.ndarray,
                   flips: np.ndarray, crop: int, normalize: bool = True
                   ) -> np.ndarray:
    """Crop+flip+normalize uint8 HWC images -> float32 (N, crop, crop, C).

    crop_xy: (N, 2) int (x, y) top-left corners; flips: (N,) bool.
    normalize=True -> [-1, 1]; False -> [0, 1].
    """
    n = len(imgs)
    c = imgs[0].shape[2] if imgs[0].ndim == 3 else 1
    scale, offset = (2.0, -1.0) if normalize else (1.0, 0.0)
    lib = _lib()
    if lib is None:
        out = np.empty((n, crop, crop, c), np.float32)
        for i, im in enumerate(imgs):
            if im.ndim == 2:
                im = im[..., None]
            x, y = int(crop_xy[i, 0]), int(crop_xy[i, 1])
            w = im[y: y + crop, x: x + crop]
            if flips[i]:
                w = w[:, ::-1]
            out[i] = w.astype(np.float32) / 255.0 * scale + offset
        return out

    imgs_c = []
    for im in imgs:
        if im.ndim == 2:
            im = im[..., None]
        imgs_c.append(np.ascontiguousarray(im, np.uint8))
    ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in imgs_c])
    in_h, in_w = imgs_c[0].shape[:2]
    cx = np.ascontiguousarray(crop_xy[:, 0], np.int32)
    cy = np.ascontiguousarray(crop_xy[:, 1], np.int32)
    fl = np.ascontiguousarray(flips, np.uint8)
    out = np.empty((n, crop, crop, c), np.float32)
    lib.assemble_batch(
        ptrs, n, in_h, in_w, c,
        cx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cy.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        crop, scale, offset,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def decode_image(path: str, grayscale: bool = False) -> np.ndarray | None:
    """Decode a PNG/JPEG file with the native (libpng/libjpeg) decoder.

    Returns uint8 (H, W, 3) RGB or (H, W) grayscale, or None when the
    native library is absent or the file isn't a PNG/JPEG (caller falls
    back to PIL). PNG decode and the grayscale conversion (PIL's ITU-R
    601-2 integer formula) are byte-exact with
    ``PIL.Image.open().convert("RGB"|"L")``; JPEG decode matches within
    ±1 per sample — it depends on the system libjpeg's IDCT, which may
    differ from PIL's bundled libjpeg-turbo (tests/test_native.py asserts
    the ±1 bound).
    """
    lib = _lib()
    if lib is None or not hasattr(lib, "decode_image"):
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    p = path.encode()
    if lib.image_size(p, ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    shape = (h.value, w.value) if grayscale else (h.value, w.value, 3)
    out = np.empty(shape, np.uint8)
    rc = lib.decode_image(
        p, 1 if grayscale else 3,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h.value, w.value)
    return out if rc == 0 else None


def float_to_pcm16(x: np.ndarray) -> np.ndarray:
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        return np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
    out = np.empty(x.shape[0], np.int16)
    lib.float_to_pcm16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return out
