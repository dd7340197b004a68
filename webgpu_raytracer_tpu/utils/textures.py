"""Texture decoding: raw encoded bytes -> fixed-size RGB texture array.

Parity with reference ResourceManager.ts:153-208: every texture is decoded
(createImageBitmap there, PIL here) and force-resized to one
TEX_SIZE x TEX_SIZE layer of a single texture array; decode failures fall
back to a magenta-checker-free solid fallback like the reference's fallback
bitmaps.
"""

from __future__ import annotations

import io

import numpy as np

TEX_SIZE = 1024


def decode_texture(data: bytes, size: int = TEX_SIZE) -> np.ndarray:
    """Decode one image to (size, size, 3) float32 in [0, 1]."""
    try:
        from PIL import Image

        img = Image.open(io.BytesIO(data)).convert("RGB")
        img = img.resize((size, size), Image.BILINEAR)
        return np.asarray(img, np.float32) / 255.0
    except Exception:
        # fallback texture (reference ResourceManager.ts:171-177)
        return np.full((size, size, 3), 0.8, np.float32)


def decode_world_textures(world, size: int = TEX_SIZE) -> np.ndarray | None:
    """Decode all of a NativeWorld's textures; None when it has none."""
    count = world.texture_count()
    if count == 0:
        return None
    layers = []
    for i in range(count):
        data = world.texture(i)
        if data:
            layers.append(decode_texture(data, size))
        else:
            layers.append(np.ones((size, size, 3), np.float32))
    return np.stack(layers)
