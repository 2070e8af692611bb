"""Image loading front door: native libjpeg decode with PIL fallback.

The reference decodes every image through PIL (train.py:667, eval loaders);
on a TPU host the Python-side decode becomes the eval/serving bottleneck at
high batch. `load_image` uses the C++ decoder (native/preprocess.cpp
tpp_jpeg_decode) for JPEG files when libtpp.so is built, PIL otherwise —
both return a PIL Image so every existing consumer is unchanged.
"""

from __future__ import annotations

import os

from PIL import Image

from tokenpacker_tpu.image import native

_JPEG_EXT = (".jpg", ".jpeg", ".JPG", ".JPEG")


def load_image(path: str) -> Image.Image:
    if path.endswith(_JPEG_EXT) and native.jpeg_available():
        try:
            with open(path, "rb") as f:
                arr = native.decode_jpeg(f.read())
            return Image.fromarray(arr, "RGB")
        except ValueError:
            pass  # not actually a baseline/valid JPEG — PIL handles the rest
    return Image.open(path).convert("RGB")
