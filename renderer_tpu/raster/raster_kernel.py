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

MSAA: ALL sample positions are evaluated per streamed chunk (the edge/depth
planes at each Vulkan standard position), writing [S, th, tw] blocks — one
pass over the binned buffer serves every sample, instead of one kernel launch
(and one full bin-stream DMA) per sample.

Depth semantics parity: clear depth = 0.0, compare GREATER_OR_EQUAL
(reference: renderer/src/renderer/pipeline_parameters/render_passes.rs:192-197,
renderer/src/renderer/pipelines.rs:152-158); on equal depth the
later-submitted triangle wins, matching draw order. The merge is written as
a lexicographic (z, triangle-id) max — equivalent to the submission-order
semantics (stream index = submission order) and ORDER-INVARIANT, which lets
binning feed pairs nearest-first (zbuckets) so the per-sub-chunk
conservative depth rejection (the early-Z analog, see chunk_body) can skip
occluded work without changing any pixel.

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

from renderer_tpu.raster.binning import B_ROWS, B_TID

# Triangles per DMA chunk (default; must divide the triangle capacity).
CHUNK = 256


def _binned_kernel(
    starts_ref,  # scalar prefetch [tiles+1] i32 (last = tile_row_offset)
    counts_ref,  # scalar prefetch [tiles] i32
    tri_ref,  # [B_ROWS, Pp] f32 binned rows (slim SoA, HBM)
    depth_ref,  # [S,th,tw] f32 out block
    trid_ref,  # [S,th,tw] i32 out block
    buf,  # VMEM [B_ROWS, 2*CHUNK]
    sems,  # DMA sems [2]
    *,
    tile_h: int,
    tile_w: int,
    sub: int,
    tiles_x: int,
    # in-pixel sample positions ((0.5, 0.5) = center; MSAA passes the Vulkan
    # standard positions — evaluating the planes at the shifted point is
    # equivalent to shifting the geometry, and shares ONE binned buffer and
    # ONE DMA stream across all samples)
    sample_positions: tuple = ((0.5, 0.5),),
    # stride between this shard's GLOBAL tile rows (interleaved sp sharding;
    # 1 = contiguous band / single chip)
    row_stride: int = 1,
    # Mosaic (TPU) wants the sub-chunk walk unrolled: static VMEM slices,
    # no loop overhead, full ILP across the double-buffered DMA stream.
    # Interpret mode (the CPU test oracle) rolls it into a fori_loop —
    # identical iteration order and math, but the traced module shrinks
    # ~30x (CHUNK//sub copies of the edge/depth block → one), which is
    # most of the test suite's XLA compile time.
    unroll: bool = True,
):
    # slim binned layout (binning.KEEP_ROWS): rows 0-8 edge planes (C has
    # the eps band pre-folded, setup.py), 9-11 depth plane, 12-14 1/w
    # plane, then B_TID
    n_s = len(sample_positions)
    # bins are LOCAL to this shard's tile-row range (binning tile_row_lo):
    # starts/counts are indexed by the grid step; the global tile row
    # (grid step + tile_row_offset, stashed as the last starts entry) is
    # only needed for the pixel coordinates the planes are evaluated at.
    lty = pl.program_id(0)
    ty = lty * row_stride + starts_ref[counts_ref.shape[0]]
    tx = pl.program_id(1)
    tile_index = lty * tiles_x + tx

    depth_ref[:] = jnp.zeros((n_s, tile_h, tile_w), jnp.float32)
    trid_ref[:] = jnp.full((n_s, tile_h, tile_w), -1, jnp.int32)

    tile_x0 = (tx * tile_w).astype(jnp.float32)
    tile_y0 = (ty * tile_h).astype(jnp.float32)
    iota_x = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    iota_y = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    px3 = [(tile_x0 + dx + iota_x)[None] for dx, _ in sample_positions]
    py3 = [(tile_y0 + dy + iota_y)[None] for _, dy in sample_positions]

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

    # Conservative tile extent for the early-depth (Hi-Z analog) test:
    # every sample position lies in [tile_x0, tile_x0 + tile_w) ×
    # [tile_y0, tile_y0 + tile_h).
    ez_x0, ez_x1 = tile_x0, tile_x0 + float(tile_w)
    ez_y0, ez_y1 = tile_y0, tile_y0 + float(tile_h)

    def sub_z_near(t):
        """Conservative NEAREST depth (reverse-Z max) any triangle of the
        sub-chunk can write anywhere in this tile: corner-max of each depth
        plane over the tile extent, clamped to the z ≤ 1 depth-range clip.
        Padding columns (all-zero planes) contribute 0 — never the max of a
        sub with live work, and a harmless no-skip when the tile still has
        background (d_min = 0)."""
        za, zb, zc = t[:, 9], t[:, 10], t[:, 11]
        zm = (za * jnp.where(za > 0, ez_x1, ez_x0)
              + zb * jnp.where(zb > 0, ez_y1, ez_y0) + zc)
        return jnp.max(jnp.minimum(zm, 1.0))

    def process_sub(t, base_in_bin):
        # t: [sub, B_ROWS] triangle planes (slim layout)
        def col(k):
            return t[:, k].reshape(sub, 1, 1)

        # no valid row: invalid/padding columns have all-zero planes, which
        # can never cover (e' = 0 fails the strict test and the ownership
        # tie-break needs a > 0 or b > 0)
        live = base_in_bin + sub_iota < count
        tid = col(B_TID).astype(jnp.int32)

        for s in range(n_s):
            px, py = px3[s], py3[s]

            # Fill rule: pixels in the ±eps boundary band of an edge belong
            # to exactly one of the two triangles sharing it (top-left
            # ownership by the edge plane's coefficient signs) — no cracks,
            # no double hits [fixed-function → kernel: the Vulkan
            # watertightness rule]. The band is pre-folded into C
            # (setup.py): covered ⟺ e' > 0, with the owning edge keeping
            # its boundary via the ≥ tie-break.
            def edge(a, b, c):
                e = a * px + b * py + c
                own = (a > 0.0) | ((a == 0.0) & (b > 0.0))
                return (e > 0.0) | (own & (e >= 0.0))

            cover = (
                edge(col(0), col(1), col(2))
                & edge(col(3), col(4), col(5))
                & edge(col(6), col(7), col(8))
                & live
            )

            z = col(9) * px + col(10) * py + col(11)
            # 1/w > 0 excludes the anti-triangle branch of near-crossing
            # triangles; z∈[0,1] is the Vulkan depth-range clip (= near clip
            # under reverse-Z).
            inv_w = col(12) * px + col(13) * py + col(14)
            zc = jnp.where(
                cover & (inv_w > 0.0) & (z >= 0.0) & (z <= 1.0), z, -1.0
            )

            zbest = jnp.max(zc, axis=0)
            tid_best = jnp.max(jnp.where(zc == zbest[None], tid, -1), axis=0)

            # Lexicographic (z, id) max merge: on equal depth the LARGER
            # triangle id wins = later submission (the stream index is
            # submission order), reference depth-tie parity — and the
            # reduction is ORDER-INVARIANT, so the binning may feed pairs
            # nearest-first (zbuckets) for the early-depth skip above
            # without changing a single pixel.
            write = (zbest >= 0.0) & (
                (zbest > depth_ref[s])
                | ((zbest == depth_ref[s]) & (tid_best > trid_ref[s]))
            )
            depth_ref[s] = jnp.where(write, zbest, depth_ref[s])
            trid_ref[s] = jnp.where(write, tid_best, trid_ref[s])

    def chunk_body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < num_chunks)
        def _():
            chunk_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

        chunk_dma(slot, ci).wait()
        soa = buf[:, pl.ds(pl.multiple_of(slot * CHUNK, CHUNK), CHUNK)]  # [B_ROWS,CHUNK]
        chunk = soa.T  # [CHUNK,ROWS]
        base = ci * CHUNK
        # Early-depth rejection floor (the early-Z analog; reference:
        # pipelines.rs:152-158 hardware depth test): the FARTHEST depth
        # currently stored anywhere in the tile (min over samples/pixels;
        # reverse-Z). A sub-chunk whose conservative nearest depth is
        # STRICTLY farther cannot win any sample (even ties lose nothing:
        # equal depth is kept) — skip its whole coverage/depth evaluation.
        # d_min only grows within a tile, so a per-chunk snapshot is safe
        # for every sub in the chunk. With nearest-first pair order
        # (binning zbuckets) a covered tile starts skipping after the
        # first opaque layers.
        d_min = jnp.min(depth_ref[:])
        if unroll:
            for sc in range(CHUNK // sub):
                t = chunk[sc * sub : (sc + 1) * sub]

                @pl.when((base + sc * sub < count) & (sub_z_near(t) >= d_min))
                def _(t=t, sc=sc):
                    process_sub(t, base + sc * sub)
        else:
            def sub_body(sc, _):
                t = jax.lax.dynamic_slice_in_dim(chunk, sc * sub, sub, 0)

                @pl.when((base + sc * sub < count) & (sub_z_near(t) >= d_min))
                def _():
                    process_sub(t, base + sc * sub)
                return 0

            jax.lax.fori_loop(0, CHUNK // sub, sub_body, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("padded_height", "padded_width", "tile_h", "tile_w",
                     "sub", "sample_positions", "interpret", "unroll",
                     "row_stride"),
)
def rasterize_binned(
    binned: jnp.ndarray,  # [B_ROWS, Pp] f32 slim SoA from binning
    starts: jnp.ndarray,  # [tiles] i32
    counts: jnp.ndarray,  # [tiles] i32
    *,
    tile_row_offset=0,
    padded_height: int,
    padded_width: int,
    tile_h: int = 32,
    tile_w: int = 128,
    sub: int = 8,
    sample_positions: tuple = ((0.5, 0.5),),  # in-pixel positions (MSAA)
    row_stride: int = 1,  # global-row stride (interleaved sp sharding)
    interpret: bool = False,
    unroll: bool | None = None,  # default: unrolled on TPU, rolled in
    # interpret mode (tests override to pin bit-equality of both paths)
):
    """Per-tile-binned visibility raster: each grid step streams only its own
    tile's (contiguous) triangle rows ONCE and evaluates every sample
    position. Returns (depth [S, Hp, Wp], tri_id [S, Hp, Wp])."""
    tiles_y = padded_height // tile_h
    tiles_x = padded_width // tile_w
    n_s = len(sample_positions)

    starts_plus = jnp.concatenate(
        [starts.astype(jnp.int32),
         jnp.asarray(tile_row_offset, jnp.int32).reshape(1)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((n_s, tile_h, tile_w), lambda ty, tx, s, c: (0, ty, tx)),
            pl.BlockSpec((n_s, tile_h, tile_w), lambda ty, tx, s, c: (0, ty, tx)),
        ),
        scratch_shapes=[
            pltpu.VMEM((B_ROWS, 2 * CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _binned_kernel, tile_h=tile_h, tile_w=tile_w, sub=sub, tiles_x=tiles_x,
        sample_positions=tuple(sample_positions), row_stride=row_stride,
        unroll=(not interpret) if unroll is None else unroll,
    )
    depth, trid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_s, padded_height, padded_width), jnp.float32),
            jax.ShapeDtypeStruct((n_s, padded_height, padded_width), jnp.int32),
        ),
        interpret=interpret,
    )(starts_plus, counts.astype(jnp.int32), binned)
    return depth, trid
