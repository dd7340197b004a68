"""Post-process chain: accumulate -> firefly clamp -> un-jitter -> bilateral
-> TAA -> ACES -> sharpen -> gamma.

Semantic contract = reference PostProcess.wgsl:36-176. Pure jnp — XLA fuses
the whole chain into a handful of elementwise/stencil kernels, so no Pallas is
needed here (SURVEY.md §7.1).
"""

from __future__ import annotations

import jax.numpy as jnp


def _edge_pad(img):
    """Pad H,W by 1 with edge clamping (matches coord clamping in wgsl:42)."""
    return jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")


def _shift(padded, dy, dx, H, W):
    return padded[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W, :]


def get_radiance(acc):
    """(H,W,4) sum+count -> mean radiance; zero where no samples (wgsl:41-47)."""
    a = acc[..., 3:4]
    return jnp.where(a > 0.0, acc[..., 0:3] / jnp.maximum(a, 1e-20), 0.0)


def firefly_clamp(rad):
    """Clamp each pixel to 3x the 3x3 neighborhood max + 0.1 (wgsl:49-68)."""
    H, W, _ = rad.shape
    p = _edge_pad(rad)
    max_nb = jnp.full_like(rad, -1e6)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            max_nb = jnp.maximum(max_nb, _shift(p, dy, dx, H, W))
    return jnp.clip(rad, 0.0, max_nb * 3.0 + 0.1)


def _bilinear_sample(img, fy, fx):
    """Clamped bilinear gather at float pixel coords (fy, fx), both (H,W)."""
    H, W, _ = img.shape
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    wy = (fy - y0)[..., None]
    wx = (fx - x0)[..., None]

    def at(yi, xi):
        yi = jnp.clip(yi, 0, H - 1)
        xi = jnp.clip(xi, 0, W - 1)
        return img[yi, xi]

    c00 = at(y0, x0)
    c10 = at(y0, x0 + 1)
    c01 = at(y0 + 1, x0)
    c11 = at(y0 + 1, x0 + 1)
    return (c00 * (1 - wx) + c10 * wx) * (1 - wy) + (c01 * (1 - wx) + c11 * wx) * wy


def unjittered_radiance(clean, frame_count, average_jitter):
    """Resample at uv - average_jitter for the first 16 frames (wgsl:87-97)."""
    H, W, _ = clean.shape
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1), jnp.float32)
    # uv = (coord + 0.5)/dims; sample at uv - avg_jitter -> pixel coords:
    fy = ys + 0.5 - average_jitter[1] * H - 0.5
    fx = xs + 0.5 - average_jitter[0] * W - 0.5
    resampled = _bilinear_sample(clean, fy, fx)
    return jnp.where(frame_count > 16, clean, resampled)


def aces(color):
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((color * (a * color + b)) / (color * (c * color + d) + e),
                    0.0, 1.0)


def postprocess(acc, history, frame_count, average_jitter):
    """Full chain. acc (H,W,4), history (H,W,3) HDR.

    Returns (ldr uint8 (H,W,3), new_history (H,W,3)).
    """
    rad = get_radiance(acc)
    clean = firefly_clamp(rad)
    u = unjittered_radiance(clean, frame_count, average_jitter)

    H, W, _ = u.shape
    up = _edge_pad(u)

    # Bilateral 3x3, sigma_s=0.5, sigma_r=0.1 (wgsl:113-133).
    SIGMA_S = 0.5
    SIGMA_R = 0.1
    filtered = jnp.zeros_like(u)
    weight = jnp.zeros((H, W, 1), u.dtype)
    m1 = jnp.zeros_like(u)
    m2 = jnp.zeros_like(u)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb = _shift(up, dy, dx, H, W)
            w_s = jnp.exp(-(dx * dx + dy * dy) / (2.0 * SIGMA_S * SIGMA_S))
            diff = nb - u
            w_r = jnp.exp(-jnp.sum(diff * diff, axis=-1, keepdims=True)
                          / (2.0 * SIGMA_R))
            w = w_s * w_r
            filtered = filtered + nb * w
            weight = weight + w
            m1 = m1 + nb
            m2 = m2 + nb * nb
    denoised = filtered / jnp.maximum(weight, 1e-4)

    # TAA with neighborhood mean +- k*sigma clamping (wgsl:136-167).
    mean = m1 / 9.0
    std = jnp.sqrt(jnp.maximum(m2 / 9.0 - mean * mean, 0.0))
    k = jnp.where(frame_count > 16, 60.0, 1.0)
    clamped_hist = jnp.clip(history, mean - std * k, mean + std * k)
    alpha = jnp.maximum(1.0 / jnp.maximum(frame_count.astype(jnp.float32), 1.0),
                        1e-4)
    alpha = jnp.where(frame_count == 1, 0.1, alpha)
    final_hdr = clamped_hist + (denoised - clamped_hist) * alpha

    # Tone map + sharpen + gamma (wgsl:170-175).
    mapped = aces(final_hdr)
    sharpened = mapped + aces(u - denoised) * 0.3
    ldr = jnp.clip(sharpened, 0.0, 1.0) ** (1.0 / 2.2)
    ldr_u8 = (ldr * 255.0 + 0.5).astype(jnp.uint8)
    return ldr_u8, final_hdr
