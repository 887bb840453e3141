"""Image-space helpers: denormalise, uint8 conversion, afmhot colormap, PNG IO.

Semantics pinned to the reference:
* ``denormalize`` = clamp(x*0.5 + 0.5, 0, 1) (models/utils.py:11).
* ``to_int`` = torchvision ConvertImageDtype(uint8): float in [0,1] is scaled
  by (255 + 1 - eps) and truncated (models/utils.py:12).
* ``afmhot_rgb`` = matplotlib "afmhot" colormap applied to a grayscale image
  (report.py:220-233) — evaluated through a 256-entry LUT so it can run on
  device as a gather.

PNG IO prefers the native C++ codec (pai_tpu/native); PIL is the fallback.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_UINT8_SCALE = 255.0 + 1.0 - 1e-3  # torchvision convert_image_dtype epsilon


def denormalize(x):
    return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)


def to_int(x):
    """float [0,1] -> uint8, torchvision truncation semantics."""
    return jnp.clip(jnp.floor(x.astype(jnp.float32) * _UINT8_SCALE), 0, 255
                    ).astype(jnp.uint8)


def to_int_np(x: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(x.astype(np.float32) * _UINT8_SCALE), 0, 255
                   ).astype(np.uint8)


_AFMHOT_LUT = None


def afmhot_lut() -> np.ndarray:
    """256x3 float LUT of matplotlib's afmhot colormap."""
    global _AFMHOT_LUT
    if _AFMHOT_LUT is None:
        from matplotlib import colormaps

        _AFMHOT_LUT = np.asarray(
            colormaps["afmhot"](np.linspace(0.0, 1.0, 256))[:, :3],
            dtype=np.float32,
        )
    return _AFMHOT_LUT


def afmhot_rgb(img: np.ndarray) -> np.ndarray:
    """Grayscale [H,W] float in [0,1] -> RGB float [H,W,3] via afmhot.

    matplotlib colormap __call__ quantises to N=256 LUT entries with
    round-half-away, i.e. index = floor(x * 256) clipped to [0, 255]."""
    lut = afmhot_lut()
    idx = np.clip((np.asarray(img) * 256.0).astype(np.int32), 0, 255)
    return lut[idx]


def write_png(array: np.ndarray, path: str, compress_level: int = 0) -> None:
    """Write a [H,W] or [H,W,C] uint8 array as PNG (native codec if built,
    PIL fallback). Reference writes with compression_level=0
    (models/palette.py:159-167)."""
    arr = np.asarray(array)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    try:
        from pai_tpu.native import png_native

        png_native.write_png(arr, path, compress_level)
        return
    except Exception:
        pass
    from PIL import Image

    Image.fromarray(arr).save(path, compress_level=compress_level)


def read_png_gray(path: str) -> np.ndarray:
    """Read a PNG as single-channel uint8 [H,W] (torchvision
    ImageReadMode.GRAY semantics: ITU-R 601-2 luma transform for RGB inputs)."""
    try:
        from pai_tpu.native import png_native

        return png_native.read_png_gray(path)
    except Exception:
        pass
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"))
