"""Triangle setup: clip space → screen space, culling, depth plane, bbox.

Replaces the fixed-function triangle setup / primitive assembly stage of the
Vulkan pipeline [fixed-function → kernel]. Behavior parity:
- Viewport transform to framebuffer coords, origin upper-left, +Y down
  (Vulkan NDC; reference clip space is already y-down).
- Back-face culling: all PBR pipelines cull back faces with CCW front
  (reference: renderer/src/renderer/pipelines.rs:147-158); in framebuffer
  coords CCW ⟺ positive shoelace area.
- Near-plane handling: triangles with any w ≤ ε are rejected (true near-plane
  clipping with vertex splitting is TODO; the infinite-far reverse-Z
  projection keeps w = z_view so this rejects geometry behind the camera).
- Depth is NDC z = z_clip/w (reverse-Z, 1 = near), which interpolates
  linearly in screen space → stored as a per-triangle affine plane
  z(x, y) = z_a·x + z_b·y + z_c, two fused multiply-adds per pixel in the
  raster kernel.

Output layout: one [16, Tc] f32 array (SoA — the raster kernel DMAs
lane-aligned [16, CHUNK] slices of it); rows:
  0-5: x0 y0 x1 y1 x2 y2 (screen coords of the three vertices)
  6-8: z_a z_b z_c (depth plane)
  9-12: bbox xmin ymin xmax ymax
  13: valid (1.0 / 0.0)
  14-15: reserved
"""

from __future__ import annotations

import jax.numpy as jnp

W_EPS = 1e-6


def triangle_setup(
    clip: jnp.ndarray,  # [VE,4]
    tri_v: jnp.ndarray,  # [Tc,3] i32 expanded-vertex ids
    num_tris,  # traced i32 scalar — triangles at index ≥ num_tris are invalid
    width: int,
    height: int,
) -> jnp.ndarray:
    tc = tri_v.shape[0]
    c = clip[tri_v]  # [Tc,3,4]
    w = c[:, :, 3]
    w_ok = jnp.all(w > W_EPS, axis=1)
    inv_w = jnp.reciprocal(jnp.where(jnp.abs(w) > W_EPS, w, 1.0))

    x = (c[:, :, 0] * inv_w * 0.5 + 0.5) * width  # [Tc,3]
    y = (c[:, :, 1] * inv_w * 0.5 + 0.5) * height
    z = c[:, :, 2] * inv_w

    # Vulkan front-face determination: with framebuffer y pointing down, a
    # COUNTER_CLOCKWISE front face has *negative* shoelace area (the spec's
    # area formula carries a minus sign; verified against the reference's
    # triangle example winding, examples/triangle/src/main.rs:69-71). We swap
    # v1↔v2 up front so front faces get positive area and the raster kernel's
    # interior test is uniformly "all edge functions ≥ 0".
    x0, x1, x2 = x[:, 0], x[:, 2], x[:, 1]
    y0, y1, y2 = y[:, 0], y[:, 2], y[:, 1]
    z0, z1, z2 = z[:, 0], z[:, 2], z[:, 1]

    # Signed area ×2 (shoelace) of the swapped triangle; positive = front.
    area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    front = area2 > 0.0
    inv_area = jnp.reciprocal(jnp.where(front, area2, 1.0))

    z_a = ((z1 - z0) * (y2 - y0) - (z2 - z0) * (y1 - y0)) * inv_area
    z_b = ((z2 - z0) * (x1 - x0) - (z1 - z0) * (x2 - x0)) * inv_area
    z_c = z0 - z_a * x0 - z_b * y0

    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    on_screen = (xmax >= 0.0) & (xmin <= width) & (ymax >= 0.0) & (ymin <= height)

    in_range = jnp.arange(tc, dtype=jnp.int32) < num_tris
    valid = in_range & w_ok & front & on_screen
    validf = valid.astype(jnp.float32)

    rows = [x0, y0, x1, y1, x2, y2, z_a, z_b, z_c, xmin, ymin, xmax, ymax,
            validf, jnp.zeros_like(validf), jnp.zeros_like(validf)]
    tri_data = jnp.stack(rows, axis=0)  # [16,Tc]
    # Zero out invalid columns so padded/culled triangles can never rasterize
    # even if a later stage skips the valid row.
    return jnp.where(validf[None, :] > 0, tri_data, jnp.zeros_like(tri_data))
