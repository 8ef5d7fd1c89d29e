"""Frame-function assembly: the whole GPU column of the reference's frame
(vertex transform+skinning → raster/depth → shading → tonemap,
reference: renderer/src/renderer.rs:359-572 command buffer) as one jittable
function over device arrays.

Pass structure (matching the reference's pipeline iteration order,
renderer.rs:433-441 — opaque, then alpha-to-coverage, then blended — all
sharing one reverse-Z depth buffer):

1. vertex + skinning (vertex_stage)
2. triangle setup + per-tile binning (setup, binning)
3. opaque visibility raster (raster_kernel.rasterize_binned)
4. masked (alpha-cutoff) top-K layer raster (layers) → per-layer alpha test →
   merge the nearest passing fragment into the visibility buffer
5. one deferred full shade of the merged solid visibility buffer (shade)
6. blended ordered-accept layer raster (layers) → per-layer full shade →
   src-alpha composite in acceptance order (pipelines.rs:112-132)
7. ACES tonemap + sRGB encode (post)

MSAA 4× (the reference's default, examples/sandbox/src/main.rs:114-117) runs
steps 3-6 once per sample at the Vulkan standard sample positions by shifting
the binned triangle rows (one cheap elementwise transform per sample — the
bins themselves are shared, built with a half-pixel-padded bbox), shading
every sample (supersampling ⊇ sample-rate shading) and resolving by AVERAGE
after tonemap (render_passes.rs:28-42; the post pass runs per sample,
physical_device.rs:265-266). Alpha-to-coverage gets the per-sample coverage
thresholds a·4 > s+0.5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from renderer_tpu.core.config import RenderConfig
from renderer_tpu.raster import (
    binning,
    layers,
    post,
    raster_kernel,
    setup,
    shade,
    vertex_stage,
)

# Vulkan standard 4xMSAA sample positions (spec table 24.1), pixel-relative.
MSAA4_POSITIONS = ((0.375, 0.125), (0.875, 0.375), (0.125, 0.625), (0.625, 0.875))


def _shift_binned(binned: jnp.ndarray, sdx: float, sdy: float) -> jnp.ndarray:
    """Shift binned triangle rows so the kernel's pixel-center evaluation
    lands on a given MSAA sample position: vertices move by (sdx, sdy) and
    the depth-plane constant compensates."""
    if sdx == 0.0 and sdy == 0.0:
        return binned
    # planes are e = A·px + B·py + C; shifting by (sdx, sdy) updates only the
    # constants: C' = C - A·sdx - B·sdy (same for the depth plane).
    def shift_c(a_row, b_row, c_row):
        return binned[c_row] - binned[a_row] * sdx - binned[b_row] * sdy

    return (
        binned.at[2].set(shift_c(0, 1, 2))
        .at[5].set(shift_c(3, 4, 5))
        .at[8].set(shift_c(6, 7, 8))
        .at[11].set(shift_c(9, 10, 11))
        .at[14].set(shift_c(12, 13, 14))
    )


def interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (the reference's
    'validation layers on a null driver' analog — tests run on CPU)."""
    return jax.default_backend() not in ("tpu",)


def render_shard(
    geom: dict,
    frame: dict,
    materials: dict,
    vs: dict,
    *,
    config: RenderConfig,
    has_masked: bool,
    has_blended: bool,
    local_tiles_y: int,
    tile_row_offset,  # traced i32: first global tile row of this shard
    row0,  # traced f32: first global pixel row of this shard
    out_rows: int,  # rows of the final image this shard produces
    interpret: bool = False,
) -> jnp.ndarray:
    """Raster + shade + composite for a horizontal band of the image (the
    whole image on a single chip). All per-pixel math runs on the padded
    band; the crop to `out_rows`×width happens at the end."""
    cfg = config
    pad_h = local_tiles_y * cfg.tile_h
    n_opaque = frame["n_opaque"]
    n_masked = frame["n_masked"]
    msaa = cfg.msaa_samples

    tri_data = setup.triangle_setup(
        vs["clip"], geom["tri_v"], frame["num_tris"], cfg.width, cfg.height,
        bbox_pad=(0.5 if msaa > 1 else 0.0),
    )

    def bins(lo, hi):
        b, s, c, _overflow = binning.bin_triangles(
            tri_data, lo, hi,
            tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            pair_capacity=cfg.pair_capacity,
        )
        return b, s, c

    bins_opaque = bins(0, n_opaque)
    bins_masked = bins(n_opaque, n_opaque + n_masked) if has_masked else None
    bins_blended = (
        bins(n_opaque + n_masked, frame["num_tris"]) if has_blended else None
    )

    def interpolants_of(tid):
        return shade.interpolants(
            tid, geom, vs, width=cfg.width, height=cfg.height, row0=row0
        )

    def render_sample(sample_index: int) -> jnp.ndarray:
        if msaa > 1:
            dx, dy = MSAA4_POSITIONS[sample_index]
            sdx, sdy = 0.5 - dx, 0.5 - dy
        else:
            sdx = sdy = 0.0

        def sample_bins(b):
            binned, starts, counts = b
            return _shift_binned(binned, sdx, sdy), starts, counts

        # -- opaque ---------------------------------------------------------
        solid_z, solid_tid = raster_kernel.rasterize_binned(
            *sample_bins(bins_opaque),
            tile_row_offset=tile_row_offset,
            padded_height=pad_h, padded_width=cfg.padded_width,
            tile_h=cfg.tile_h, tile_w=cfg.tile_w, sub=cfg.tri_chunk,
            interpret=interpret,
        )

        # -- masked (alpha-to-coverage) ---------------------------------------
        if has_masked:
            lz, lt, _ = layers.rasterize_layers(
                *sample_bins(bins_masked),
                solid_z,
                mode="masked", n_layers=cfg.mask_layers,
                tile_row_offset=tile_row_offset,
                padded_height=pad_h, padded_width=cfg.padded_width,
                tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                interpret=interpret,
            )
            # a2c: with MSAA, alpha additionally gates per-sample coverage
            # (sample s covered iff a·S > s + 0.5).
            a2c_floor = (sample_index + 0.5) / msaa if msaa > 1 else 0.0
            # far → near so the nearest passing fragment wins.
            for k in reversed(range(cfg.mask_layers)):
                it_k = interpolants_of(lt[k])
                alpha, cutoff = shade.base_alpha(it_k, frame, materials,
                                                 cfg.trilinear, cfg.aniso_samples)
                passes = (lt[k] >= 0) & (alpha > cutoff) & (alpha > a2c_floor)
                solid_tid = jnp.where(passes, lt[k], solid_tid)
                solid_z = jnp.where(passes, lz[k], solid_z)

        # -- one full shade of the solid visibility buffer -------------------
        hdr = shade.shade_interpolated(
            interpolants_of(solid_tid), vs, frame, materials,
            cfg.trilinear, cfg.aniso_samples,
        )
        hdr_rgb = hdr[..., :3]

        # -- blended, ordered accept + src-alpha composite -------------------
        if has_blended:
            _, lt_b, _ = layers.rasterize_layers(
                *sample_bins(bins_blended),
                solid_z,
                mode="blended", n_layers=cfg.blend_layers,
                tile_row_offset=tile_row_offset,
                padded_height=pad_h, padded_width=cfg.padded_width,
                tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                interpret=interpret,
            )
            for k in range(cfg.blend_layers):
                color_k = shade.shade_interpolated(
                    interpolants_of(lt_b[k]), vs, frame, materials,
                    cfg.trilinear, cfg.aniso_samples,
                )
                a = jnp.where((lt_b[k] >= 0)[..., None], color_k[..., 3:4], 0.0)
                hdr_rgb = hdr_rgb * (1.0 - a) + color_k[..., :3] * a
        return hdr_rgb

    if msaa > 1:
        img = post.tonemap(jnp.stack([render_sample(s) for s in range(msaa)]))
    else:
        img = post.tonemap(render_sample(0))
    return img[:out_rows, : cfg.width]


def render_frame(
    geom: dict,
    frame: dict,
    materials: dict,
    *,
    config: RenderConfig,
    skin_start: int,
    has_masked: bool = True,
    has_blended: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-chip frame: returns the final u8 RGB image [H, W, 3]."""
    from renderer_tpu.scene.draw_stream import unpack_frame

    frame = unpack_frame(frame)
    vs = vertex_stage.run_vertex_stage(geom, frame, skin_start)
    return render_shard(
        geom, frame, materials, vs,
        config=config,
        has_masked=has_masked,
        has_blended=has_blended,
        local_tiles_y=config.tiles_y,
        tile_row_offset=0,
        row0=0.0,
        out_rows=config.height,
        interpret=interpret,
    )
