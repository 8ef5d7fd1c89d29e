"""Post-process pass: exposure + ACES tonemap + sRGB encode (+ MSAA resolve).

Parity: renderer/shaders/glsl/render_res_pp.frag:22-48 — exposure 0.8, ACES
fit clamp(x(2.51x+0.03) / (x(2.43x+0.59)+0.14), 0, 1). The reference writes
to an sRGB swapchain image, so the hardware applies the sRGB OETF after the
shader; we apply it explicitly before quantizing to u8. MSAA resolve is
AVERAGE mode (render_passes.rs:28-42), i.e. a mean over samples — but in the
reference the resolve happens *after* this tonemap pass (sample-rate shading
runs the post-process per sample, physical_device.rs:265-266), so we resolve
after tonemapping too.
"""

from __future__ import annotations

import jax.numpy as jnp

EXPOSURE = 0.8


def aces(x: jnp.ndarray) -> jnp.ndarray:
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def srgb_encode(linear: jnp.ndarray) -> jnp.ndarray:
    linear = jnp.clip(linear, 0.0, 1.0)
    lo = linear * 12.92
    hi = 1.055 * jnp.power(jnp.maximum(linear, 1e-7), 1.0 / 2.4) - 0.055
    return jnp.where(linear <= 0.0031308, lo, hi)


def srgb_decode(encoded: jnp.ndarray) -> jnp.ndarray:
    lo = encoded / 12.92
    hi = jnp.power((encoded + 0.055) / 1.055, 2.4)
    return jnp.where(encoded <= 0.04045, lo, hi)


def srgb_decode_np(encoded):
    """Host-side (numpy) sRGB EOTF, for texture preprocessing."""
    import numpy as np

    encoded = np.asarray(encoded, np.float32)
    lo = encoded / 12.92
    hi = ((encoded + 0.055) / 1.055) ** 2.4
    return np.where(encoded <= 0.04045, lo, hi).astype(np.float32)


def tonemap(hdr_rgb: jnp.ndarray) -> jnp.ndarray:
    """Linear HDR [..., 3] → display-ready u8 [..., 3]. If a leading samples
    axis is present ([S, H, W, 3]), tonemap per sample then resolve."""
    mapped = aces(hdr_rgb * EXPOSURE)
    if mapped.ndim == 4:
        mapped = jnp.mean(mapped, axis=0)
    encoded = srgb_encode(mapped)
    return jnp.round(encoded * 255.0).astype(jnp.uint8)
