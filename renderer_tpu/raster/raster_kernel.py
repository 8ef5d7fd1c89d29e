"""Pallas visibility-buffer raster kernel.

Replaces the Vulkan fixed-function rasterizer + depth test
[fixed-function → kernel]. The kernel grid walks screen tiles
(tile_h × tile_w pixels, sublane/lane aligned); each grid step owns its tile's
depth + triangle-id block in VMEM and streams the triangle array from HBM in
double-buffered DMA chunks, so DMA of chunk i+1 overlaps the math of chunk i.

Per chunk: a cheap [CHUNK]-wide AABB-vs-tile test skips chunks that don't
touch this tile (spatially coherent meshes make most chunks skip — this is
the hierarchical-binning fallback; explicit per-tile bins come later). A
surviving chunk is processed in vectorized sub-chunks of C triangles: the
three edge functions and the depth plane are evaluated for all C triangles
over all tile pixels at once ([C, th, tw] VPU ops, zero per-pixel control
flow), reduced over C with max (reverse-Z: nearer = larger), then merged into
the tile's running z-buffer.

Depth semantics parity: clear depth = 0.0, compare GREATER_OR_EQUAL
(reference: renderer/src/renderer/pipeline_parameters/render_passes.rs:192-197,
renderer/src/renderer/pipelines.rs:152-158); on equal depth the
later-submitted triangle wins, matching draw order.

Output: per-pixel {depth f32, tri_id i32} (tri_id = -1 where uncovered); all
shading happens in the deferred stage (raster/shade.py), so raster cost is
independent of material complexity and shading cost is independent of
overdraw.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Triangles per DMA chunk (default; must divide the triangle capacity).
CHUNK = 256


def _raster_kernel(
    scalars_ref,  # scalar prefetch [2] i32: (num_chunks, tile_row_offset)
    tri_ref,  # [16,Tc] f32 in HBM/ANY (SoA, see setup.py)
    depth_ref,  # [th,tw] f32 out block
    trid_ref,  # [th,tw] i32 out block
    buf,  # VMEM [2, CHUNK, 16]
    sems,  # DMA sems [2]
    *,
    tile_h: int,
    tile_w: int,
    sub: int,
):
    # tile_row_offset shifts this kernel's tile rows in global screen space
    # (non-zero when the image is sharded over devices by tile rows).
    ty = pl.program_id(0) + scalars_ref[1]
    tx = pl.program_id(1)

    depth_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
    trid_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)

    # Pixel-center coordinates of this tile.
    tile_x0 = (tx * tile_w).astype(jnp.float32)
    tile_y0 = (ty * tile_h).astype(jnp.float32)
    px = tile_x0 + 0.5 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    py = tile_y0 + 0.5 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    px3 = px[None]
    py3 = py[None]
    # Tile pixel-center bounds for the conservative chunk test.
    tpx_min, tpx_max = tile_x0 + 0.5, tile_x0 + tile_w - 0.5
    tpy_min, tpy_max = tile_y0 + 0.5, tile_y0 + tile_h - 0.5

    num_chunks = scalars_ref[0]

    # SoA layout: a chunk is a [16, CHUNK] lane-aligned slice; the scratch
    # holds two slots side by side on the lane axis (both 128-aligned).
    def chunk_dma(slot, ci):
        return pltpu.make_async_copy(
            tri_ref.at[:, pl.ds(ci * CHUNK, CHUNK)],
            buf.at[:, pl.ds(slot * CHUNK, CHUNK)],
            sems.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        chunk_dma(0, 0).start()

    def process_sub(t, ci, sc):
        # t: [sub,16] triangle params
        def col(k):
            return t[:, k].reshape(sub, 1, 1)

        x0, y0, x1, y1, x2, y2 = col(0), col(1), col(2), col(3), col(4), col(5)
        z_a, z_b, z_c = col(6), col(7), col(8)
        live = col(13) > 0.0

        e0 = (x2 - x1) * (py3 - y1) - (y2 - y1) * (px3 - x1)
        e1 = (x0 - x2) * (py3 - y2) - (y0 - y2) * (px3 - x2)
        e2 = (x1 - x0) * (py3 - y0) - (y1 - y0) * (px3 - x0)
        cover = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & live

        z = z_a * px3 + z_b * py3 + z_c
        # Depth-range clip ([0,1], Vulkan depth clip) folded into coverage;
        # -1 marks "no fragment".
        zc = jnp.where(cover & (z >= 0.0) & (z <= 1.0), z, -1.0)

        zbest = jnp.max(zc, axis=0)  # [th,tw]
        tid = (ci * CHUNK + sc * sub) + jax.lax.broadcasted_iota(jnp.int32, (sub, 1, 1), 0)
        tid_best = jnp.max(jnp.where(zc == zbest[None], tid, -1), axis=0)

        write = (zbest >= 0.0) & (zbest >= depth_ref[:])
        depth_ref[:] = jnp.where(write, zbest, depth_ref[:])
        trid_ref[:] = jnp.where(write, tid_best, trid_ref[:])

    def chunk_body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < num_chunks)
        def _():
            chunk_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

        chunk_dma(slot, ci).wait()
        soa = buf[:, pl.ds(pl.multiple_of(slot * CHUNK, CHUNK), CHUNK)]  # [16,CHUNK]

        overlap = (
            (soa[9:10] <= tpx_max)
            & (soa[11:12] >= tpx_min)
            & (soa[10:11] <= tpy_max)
            & (soa[12:13] >= tpy_min)
            & (soa[13:14] > 0.0)
        )  # [1,CHUNK]

        @pl.when(jnp.any(overlap))
        def _():
            chunk = soa.T  # [CHUNK,16] — one transpose per surviving chunk
            for sc in range(CHUNK // sub):
                sub_overlap = overlap[:, sc * sub : (sc + 1) * sub]

                @pl.when(jnp.any(sub_overlap))
                def _(sc=sc):
                    process_sub(chunk[sc * sub : (sc + 1) * sub], ci, sc)

        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def _binned_kernel(
    starts_ref,  # scalar prefetch [tiles+1] i32 (last = tile_row_offset)
    counts_ref,  # scalar prefetch [tiles] i32
    tri_ref,  # [16, Pp] f32 binned rows (SoA, HBM)
    depth_ref,  # [th,tw] f32 out block
    trid_ref,  # [th,tw] i32 out block
    buf,  # VMEM [16, 2*CHUNK]
    sems,  # DMA sems [2]
    *,
    tile_h: int,
    tile_w: int,
    sub: int,
    tiles_x: int,
):
    ty = pl.program_id(0) + starts_ref[counts_ref.shape[0]]
    tx = pl.program_id(1)
    tile_index = ty * tiles_x + tx

    depth_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
    trid_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)

    tile_x0 = (tx * tile_w).astype(jnp.float32)
    tile_y0 = (ty * tile_h).astype(jnp.float32)
    px3 = (tile_x0 + 0.5 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32))[None]
    py3 = (tile_y0 + 0.5 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32))[None]

    # bin starts are 128-aligned (binning.ALIGN) so lane-dim DMA slices are
    # tile-aligned
    start = pl.multiple_of(starts_ref[tile_index], 128)
    count = counts_ref[tile_index]
    num_chunks = (count + CHUNK - 1) // CHUNK

    def chunk_dma(slot, ci):
        return pltpu.make_async_copy(
            tri_ref.at[:, pl.ds(start + ci * CHUNK, CHUNK)],
            buf.at[:, pl.ds(slot * CHUNK, CHUNK)],
            sems.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        chunk_dma(0, 0).start()

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (sub, 1, 1), 0)

    def process_sub(t, base_in_bin):
        def col(k):
            return t[:, k].reshape(sub, 1, 1)

        x0, y0, x1, y1, x2, y2 = col(0), col(1), col(2), col(3), col(4), col(5)
        z_a, z_b, z_c = col(6), col(7), col(8)
        live = (col(13) > 0.0) & (base_in_bin + sub_iota < count)

        e0 = (x2 - x1) * (py3 - y1) - (y2 - y1) * (px3 - x1)
        e1 = (x0 - x2) * (py3 - y2) - (y0 - y2) * (px3 - x2)
        e2 = (x1 - x0) * (py3 - y0) - (y1 - y0) * (px3 - x0)
        cover = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & live

        z = z_a * px3 + z_b * py3 + z_c
        zc = jnp.where(cover & (z >= 0.0) & (z <= 1.0), z, -1.0)

        zbest = jnp.max(zc, axis=0)
        tid = t[:, 14].astype(jnp.int32).reshape(sub, 1, 1)
        tid_best = jnp.max(jnp.where(zc == zbest[None], tid, -1), axis=0)

        write = (zbest >= 0.0) & (zbest >= depth_ref[:])
        depth_ref[:] = jnp.where(write, zbest, depth_ref[:])
        trid_ref[:] = jnp.where(write, tid_best, trid_ref[:])

    def chunk_body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < num_chunks)
        def _():
            chunk_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

        chunk_dma(slot, ci).wait()
        soa = buf[:, pl.ds(pl.multiple_of(slot * CHUNK, CHUNK), CHUNK)]  # [16,CHUNK]
        chunk = soa.T  # [CHUNK,16]
        base = ci * CHUNK
        for sc in range(CHUNK // sub):
            @pl.when(base + sc * sub < count)
            def _(sc=sc):
                process_sub(chunk[sc * sub : (sc + 1) * sub], base + sc * sub)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("padded_height", "padded_width", "tile_h", "tile_w", "sub", "interpret"),
)
def rasterize_binned(
    binned: jnp.ndarray,  # [16, Pp] f32 SoA from binning.bin_triangles
    starts: jnp.ndarray,  # [tiles] i32
    counts: jnp.ndarray,  # [tiles] i32
    *,
    tile_row_offset=0,
    padded_height: int,
    padded_width: int,
    tile_h: int = 32,
    tile_w: int = 128,
    sub: int = 8,
    interpret: bool = False,
):
    """Per-tile-binned visibility raster: each grid step streams only its own
    tile's (contiguous) triangle rows. Returns (depth, tri_id)."""
    tiles_y = padded_height // tile_h
    tiles_x = padded_width // tile_w

    starts_plus = jnp.concatenate(
        [starts.astype(jnp.int32),
         jnp.asarray(tile_row_offset, jnp.int32).reshape(1)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx, s, c: (ty, tx)),
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx, s, c: (ty, tx)),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, 2 * CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _binned_kernel, tile_h=tile_h, tile_w=tile_w, sub=sub, tiles_x=tiles_x
    )
    depth, trid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((padded_height, padded_width), jnp.float32),
            jax.ShapeDtypeStruct((padded_height, padded_width), jnp.int32),
        ),
        interpret=interpret,
    )(starts_plus, counts.astype(jnp.int32), binned)
    return depth, trid


@functools.partial(
    jax.jit,
    static_argnames=("padded_height", "padded_width", "tile_h", "tile_w", "sub", "interpret"),
)
def rasterize(
    tri_data: jnp.ndarray,  # [16,Tc] f32 from triangle_setup
    num_tris,  # traced i32 scalar
    *,
    tile_row_offset=0,  # traced i32: global tile-row index of row 0 (sharding)
    padded_height: int,
    padded_width: int,
    tile_h: int = 32,
    tile_w: int = 128,
    sub: int = 8,
    interpret: bool = False,
):
    """Returns (depth [Hp,Wp] f32, tri_id [Hp,Wp] i32)."""
    tc = tri_data.shape[1]
    assert tc % CHUNK == 0, f"triangle capacity {tc} must be a multiple of {CHUNK}"
    assert CHUNK % sub == 0
    tiles_y = padded_height // tile_h
    tiles_x = padded_width // tile_w

    num_chunks = jnp.minimum((num_tris + CHUNK - 1) // CHUNK, tc // CHUNK)
    scalars = jnp.stack(
        [num_chunks.astype(jnp.int32), jnp.asarray(tile_row_offset, jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles_y, tiles_x),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx, s: (ty, tx)),
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx, s: (ty, tx)),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, 2 * CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(_raster_kernel, tile_h=tile_h, tile_w=tile_w, sub=sub)
    depth, trid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((padded_height, padded_width), jnp.float32),
            jax.ShapeDtypeStruct((padded_height, padded_width), jnp.int32),
        ),
        interpret=interpret,
    )(scalars, tri_data)
    return depth, trid
