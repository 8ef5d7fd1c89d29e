"""Layered raster kernels for non-opaque geometry [fixed-function → kernel].

The reference renders alpha-to-coverage ("masked") and blended geometry
through the same fixed-function raster path with different pipeline state
(reference: renderer/src/renderer/pipeline_parameters.rs:227-233 — a2c and
blended both inherit depth test GREATER_OR_EQUAL *and depth write* from the
opaque pipelines, drawn after opaque in pipeline order,
renderer.rs:433-441). In a visibility-buffer renderer those passes cannot be
a single winner-takes-all z-test:

- **Masked** (alpha cutoff): the fragment shader may discard, so the raster
  result is "the nearest fragment whose alpha passes". Because failed
  fragments never write depth, the result is order-independent → capture the
  top-K nearest candidate fragments per pixel (insertion sort in VMEM),
  alpha-test them in the deferred stage, take the nearest passer.
- **Blended**: src-alpha blending is order-dependent and depth-write prunes:
  a fragment is accepted iff its depth ≥ every previously accepted depth
  (submission order). Capture the accepted chain (up to K layers, in order)
  per pixel, shade each layer deferred, composite in order.

Both kernels process their (binned, per-tile) triangle lists strictly
sequentially — required for insertion/ordering — reading per-triangle scalars
from an SMEM-staged copy of the list so the vector unit only ever touches
[tile_h, tile_w] blocks. MSAA: every sample position maintains its own
K-layer state, updated from ONE shared pass over the triangle list (one DMA
stream for all samples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from renderer_tpu.raster.binning import B_ROWS, B_TID

# Sequential triangle chunk staged into SMEM per DMA.
LCHUNK = 128


def _fragment(t_col, px3, py3, in_range):
    """Edge/coverage/depth for ONE triangle whose plane rows (see setup.py)
    are read as scalars via `t_col(k)`. No valid row: invalid/padding
    columns have all-zero planes, which can never cover."""
    # top-left fill rule; the f32 tolerance band is pre-folded into C
    # (setup.py), ownership recomputed from the stored A, B signs (see
    # raster_kernel).
    def edge(a, b, c):
        e = a * px3 + b * py3 + c
        own = (a > 0.0) | ((a == 0.0) & (b > 0.0))
        return (e > 0.0) | (own & (e >= 0.0))

    cover = (
        edge(t_col(0), t_col(1), t_col(2))
        & edge(t_col(3), t_col(4), t_col(5))
        & edge(t_col(6), t_col(7), t_col(8))
        & in_range
    )
    z = t_col(9) * px3 + t_col(10) * py3 + t_col(11)
    inv_w = t_col(12) * px3 + t_col(13) * py3 + t_col(14)
    cover = cover & (inv_w > 0.0) & (z >= 0.0) & (z <= 1.0)
    tid = t_col(B_TID).astype(jnp.int32)
    return cover, z, tid


def _make_layer_kernel(mode: str, n_layers: int, tile_h: int, tile_w: int,
                       tiles_x: int, sample_positions: tuple,
                       row_stride: int = 1):
    assert mode in ("masked", "blended")
    n_s = len(sample_positions)

    def kernel(starts_ref, counts_ref, tri_ref, depth_in_ref,
               lz_ref, lt_ref, aux_ref, smem, sem):
        # bins are LOCAL to this shard's tile-row range (see raster_kernel):
        # grid step indexes starts/counts; the global row feeds pixel coords.
        lty = pl.program_id(0)
        ty = lty * row_stride + starts_ref[counts_ref.shape[0]]
        tx = pl.program_id(1)
        tile_index = lty * tiles_x + tx

        lz_ref[:] = jnp.full((n_s, n_layers, tile_h, tile_w), -1.0, jnp.float32)
        lt_ref[:] = jnp.full((n_s, n_layers, tile_h, tile_w), -1, jnp.int32)
        # aux: per-(sample, pixel) count of candidate (masked) / accepted
        # (blended) fragments — may exceed n_layers, flagging truncated
        # capture. The running depth starts from the (per-sample) solid depth.
        aux_ref[:] = jnp.zeros((n_s, tile_h, tile_w), jnp.int32)
        cur_z0 = depth_in_ref[:]  # [n_s, th, tw]

        tile_x0 = (tx * tile_w).astype(jnp.float32)
        tile_y0 = (ty * tile_h).astype(jnp.float32)
        iota_x = jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
        iota_y = jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
        px3 = [tile_x0 + dx + iota_x for dx, _ in sample_positions]
        py3 = [tile_y0 + dy + iota_y for _, dy in sample_positions]

        start = pl.multiple_of(starts_ref[tile_index], 128)
        count = counts_ref[tile_index]
        num_chunks = (count + LCHUNK - 1) // LCHUNK

        def chunk_body(ci, cur_z):
            dma = pltpu.make_async_copy(
                tri_ref.at[:, pl.ds(start + ci * LCHUNK, LCHUNK)], smem, sem
            )
            dma.start()
            dma.wait()
            base = ci * LCHUNK

            def tri_body(i, cur_z):
                def t_col(k):
                    return smem[k, i]

                in_range = base + i < count
                new_z = []
                for s in range(n_s):
                    cover, z, tid = _fragment(t_col, px3[s], py3[s], in_range)

                    if mode == "masked":
                        # top-K nearest insertion; ≥ keeps later-submission-
                        # wins on equal depth. cur_z is the opaque depth
                        # floor. aux counts every candidate so aux > K flags
                        # pixels whose K-nearest capture may have dropped a
                        # passing fragment.
                        c = cover & (z >= cur_z[s])
                        aux_ref[s] = aux_ref[s] + c.astype(jnp.int32)
                        cz = jnp.where(c, z, -1.0)
                        ct = jnp.where(c, tid, -1)
                        for k in range(n_layers):
                            lzk = lz_ref[s, k]
                            ltk = lt_ref[s, k]
                            sw = cz >= lzk
                            lz_ref[s, k] = jnp.where(sw, cz, lzk)
                            lt_ref[s, k] = jnp.where(sw, ct, ltk)
                            cz = jnp.where(sw, lzk, cz)
                            ct = jnp.where(sw, ltk, ct)
                        new_z.append(cur_z[s])
                    else:
                        # ordered accept: depth test vs the running chain
                        # depth, accepted fragments write depth
                        # (pipeline_parameters.rs blended inherits depth_write
                        # from opaque). A fragment past the K-layer capacity
                        # is dropped WITHOUT writing depth: the truncation may
                        # under-blend but never makes a dropped fragment
                        # occlude later geometry (the reference's fixed-
                        # function blending has no layer cap,
                        # pipelines.rs:112-132). aux counts all accepts, so
                        # aux > K flags saturated pixels.
                        c = cover & (z >= cur_z[s])
                        nacc = aux_ref[s]
                        stored = c & (nacc < n_layers)
                        for k in range(n_layers):
                            put = c & (nacc == k)
                            lt_ref[s, k] = jnp.where(put, tid, lt_ref[s, k])
                            lz_ref[s, k] = jnp.where(put, z, lz_ref[s, k])
                        aux_ref[s] = nacc + c.astype(jnp.int32)
                        new_z.append(jnp.where(stored, z, cur_z[s]))
                return jnp.stack(new_z)

            return jax.lax.fori_loop(0, LCHUNK, tri_body, cur_z)

        jax.lax.fori_loop(0, num_chunks, chunk_body, cur_z0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "n_layers", "padded_height",
        "padded_width", "tile_h", "tile_w", "sample_positions", "interpret",
        "row_stride",
    ),
)
def rasterize_layers(
    binned: jnp.ndarray,  # [B_ROWS, Pp] f32 slim SoA (binning output)
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    depth_in: jnp.ndarray,  # [S, Hp, Wp] f32 — per-sample depth floor
    *,
    mode: str,
    n_layers: int,
    tile_row_offset=0,
    padded_height: int,
    padded_width: int,
    tile_h: int = 32,
    tile_w: int = 128,
    sample_positions: tuple = ((0.5, 0.5),),  # in-pixel positions (MSAA)
    row_stride: int = 1,  # global-row stride (interleaved sp sharding)
    interpret: bool = False,
):
    """Returns (layer_z [S,K,Hp,Wp] f32, layer_tid [S,K,Hp,Wp] i32,
    aux [S,Hp,Wp] i32 — per-(sample, pixel) candidate/accept count;
    aux > n_layers marks pixels whose capture was truncated). Layer order:
    masked = nearest first; blended = acceptance (submission) order."""
    tiles_y = padded_height // tile_h
    tiles_x = padded_width // tile_w
    n_s = len(sample_positions)
    assert depth_in.shape == (n_s, padded_height, padded_width), depth_in.shape

    starts_plus = jnp.concatenate(
        [starts.astype(jnp.int32), jnp.asarray(tile_row_offset, jnp.int32).reshape(1)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_s, tile_h, tile_w), lambda ty, tx, s, c: (0, ty, tx)),
        ],
        out_specs=(
            pl.BlockSpec((n_s, n_layers, tile_h, tile_w),
                         lambda ty, tx, s, c: (0, 0, ty, tx)),
            pl.BlockSpec((n_s, n_layers, tile_h, tile_w),
                         lambda ty, tx, s, c: (0, 0, ty, tx)),
            pl.BlockSpec((n_s, tile_h, tile_w), lambda ty, tx, s, c: (0, ty, tx)),
        ),
        scratch_shapes=[
            pltpu.SMEM((B_ROWS, LCHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = _make_layer_kernel(mode, n_layers, tile_h, tile_w, tiles_x,
                                tuple(sample_positions), row_stride)
    lz, lt, aux = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_s, n_layers, padded_height, padded_width),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_s, n_layers, padded_height, padded_width),
                                 jnp.int32),
            jax.ShapeDtypeStruct((n_s, padded_height, padded_width), jnp.int32),
        ),
        interpret=interpret,
    )(starts_plus, counts.astype(jnp.int32), binned, depth_in)
    return lz, lt, aux
