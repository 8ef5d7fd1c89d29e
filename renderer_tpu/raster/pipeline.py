"""Frame-function assembly: the whole GPU column of the reference's frame
(vertex transform+skinning → raster/depth → shading → tonemap,
reference: renderer/src/renderer.rs:359-572 command buffer) as one jittable
function over device arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from renderer_tpu.core.config import RenderConfig
from renderer_tpu.raster import post, raster_kernel, setup, shade, vertex_stage


def interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (the reference's
    'validation layers on a null driver' analog — tests run on CPU)."""
    return jax.default_backend() not in ("tpu",)


def render_frame(
    geom: dict,
    frame: dict,
    materials: dict,
    *,
    config: RenderConfig,
    skin_start: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns the final u8 RGB image [H, W, 3]."""
    vs = vertex_stage.run_vertex_stage(geom, frame, skin_start)
    tri_data = setup.triangle_setup(
        vs["clip"], geom["tri_v"], frame["num_tris"], config.width, config.height
    )
    depth, trid = raster_kernel.rasterize(
        tri_data,
        frame["num_tris"],
        padded_height=config.padded_height,
        padded_width=config.padded_width,
        tile_h=config.tile_h,
        tile_w=config.tile_w,
        sub=config.tri_chunk,
        interpret=interpret,
    )
    del depth  # needed again for the blended pass (M3)
    trid = trid[: config.height, : config.width]
    hdr = shade.shade(
        trid, geom, vs, frame, materials, width=config.width, height=config.height
    )
    return post.tonemap(hdr[..., :3])
