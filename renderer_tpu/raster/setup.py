"""Triangle setup: clip space → screen space, culling, edge/depth planes.

Replaces the fixed-function triangle setup / primitive assembly stage of the
Vulkan pipeline [fixed-function → kernel]. Behavior parity:
- Viewport transform to framebuffer coords, origin upper-left, +Y down
  (Vulkan NDC; reference clip space is already y-down).
- Back-face culling: all PBR pipelines cull back faces with CCW front
  (reference: renderer/src/renderer/pipelines.rs:147-158); in framebuffer
  coords CCW ⟺ negative shoelace area (the Vulkan area formula carries a
  minus sign), so v1/v2 are swapped up front and front faces test positive.
- Near-plane handling: triangles with any w ≤ ε are rejected (true near-plane
  clipping with vertex splitting is TODO; the infinite-far reverse-Z
  projection keeps w = z_view so this rejects geometry behind the camera).
- Depth is NDC z = z_clip/w (reverse-Z, 1 = near), which interpolates
  linearly in screen space.

Everything the raster kernels evaluate per pixel is emitted as PLANE
COEFFICIENTS — three edge functions e_i(p) = A_i·px + B_i·py + C_i and the
depth plane — so per-pixel work is two fused multiply-adds per plane. A
per-triangle epsilon (row EPS) absorbs f32 evaluation error so pixels exactly
on a shared mesh edge are covered by BOTH triangles (equal depth → the
later-submitted one wins, renderer parity) instead of falling through a
crack.

Output layout: one [ROWS=24, Tc] f32 SoA array; rows:
  0-8 : A0 B0 C0 A1 B1 C1 A2 B2 C2   (edge planes; inside = all e ≥ -eps)
  9-11: z_a z_b z_c                  (depth plane)
  12-15: bbox xmin ymin xmax ymax    (consumed by binning only)
  16  : valid (1.0 / 0.0)
  17  : original triangle id (written by binning)
  18  : eps (coverage tolerance)
  19-23: reserved / padding (sublane alignment)
"""

from __future__ import annotations

import jax.numpy as jnp

W_EPS = 1e-6
ROWS = 24
VALID_ROW = 16
TID_ROW = 17
EPS_ROW = 18


def triangle_setup(
    clip: jnp.ndarray,  # [VE,4]
    tri_v: jnp.ndarray,  # [Tc,3] i32 expanded-vertex ids
    num_tris,  # traced i32 scalar — triangles at index ≥ num_tris are invalid
    width: int,
    height: int,
    bbox_pad: float = 0.0,  # grown bbox (binning stays conservative for MSAA)
) -> jnp.ndarray:
    tc = tri_v.shape[0]
    c = clip[tri_v]  # [Tc,3,4]
    w = c[:, :, 3]
    w_ok = jnp.all(w > W_EPS, axis=1)
    inv_w = jnp.reciprocal(jnp.where(jnp.abs(w) > W_EPS, w, 1.0))

    x = (c[:, :, 0] * inv_w * 0.5 + 0.5) * width  # [Tc,3]
    y = (c[:, :, 1] * inv_w * 0.5 + 0.5) * height
    z = c[:, :, 2] * inv_w

    # Swap v1↔v2 so front faces (Vulkan CCW, negative y-down shoelace) have
    # positive area; verified against the reference triangle example winding.
    x0, x1, x2 = x[:, 0], x[:, 2], x[:, 1]
    y0, y1, y2 = y[:, 0], y[:, 2], y[:, 1]
    z0, z1, z2 = z[:, 0], z[:, 2], z[:, 1]

    area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    front = area2 > 0.0
    inv_area = jnp.reciprocal(jnp.where(front, area2, 1.0))

    # Edge planes: e_i opposite vertex i, from edge (j → k):
    # e(p) = (xk-xj)(py-yj) - (yk-yj)(px-xj) = A·px + B·py + C.
    def edge_plane(xj, yj, xk, yk):
        a = yj - yk
        b = xk - xj
        cc = (yk - yj) * xj - (xk - xj) * yj
        return a, b, cc

    a0, b0, c0 = edge_plane(x1, y1, x2, y2)
    a1, b1, c1 = edge_plane(x2, y2, x0, y0)
    a2, b2, c2 = edge_plane(x0, y0, x1, y1)

    z_a = ((z1 - z0) * (y2 - y0) - (z2 - z0) * (y1 - y0)) * inv_area
    z_b = ((z2 - z0) * (x1 - x0) - (z1 - z0) * (x2 - x0)) * inv_area
    z_c = z0 - z_a * x0 - z_b * y0

    xmin = jnp.minimum(jnp.minimum(x0, x1), x2) - bbox_pad
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2) + bbox_pad
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2) - bbox_pad
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2) + bbox_pad
    on_screen = (xmax >= 0.0) & (xmin <= width) & (ymax >= 0.0) & (ymin <= height)

    # f32 evaluation tolerance: e = A·px + B·py + C accumulates rounding of
    # the same order as ulp of its largest term.
    maxdim = float(max(width, height))
    eps = 4.0 * 2.0**-23 * (
        jnp.maximum(jnp.abs(c0), jnp.maximum(jnp.abs(c1), jnp.abs(c2)))
        + maxdim
        * jnp.maximum(
            jnp.maximum(jnp.abs(a0), jnp.abs(b0)),
            jnp.maximum(
                jnp.maximum(jnp.abs(a1), jnp.abs(b1)),
                jnp.maximum(jnp.abs(a2), jnp.abs(b2)),
            ),
        )
    )

    in_range = jnp.arange(tc, dtype=jnp.int32) < num_tris
    valid = in_range & w_ok & front & on_screen
    validf = valid.astype(jnp.float32)

    zero = jnp.zeros_like(validf)
    rows = [a0, b0, c0, a1, b1, c1, a2, b2, c2, z_a, z_b, z_c,
            xmin, ymin, xmax, ymax, validf, zero, eps,
            zero, zero, zero, zero, zero]
    assert len(rows) == ROWS
    tri_data = jnp.stack(rows, axis=0)  # [ROWS,Tc]
    # Zero out invalid columns so padded/culled triangles can never rasterize
    # even if a later stage skips the valid row.
    return jnp.where(validf[None, :] > 0, tri_data, jnp.zeros_like(tri_data))
