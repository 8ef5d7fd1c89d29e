"""Render configuration.

The reference has no config files; configuration is runtime structs
(SwapchainSettings, MSAA sample count, debug_value, Camera near/far —
reference: renderer/src/renderer/swapchain.rs:16-19,
examples/sandbox/src/main.rs:114-117). Here it is one frozen dataclass whose
fields become static jit arguments: changing any of them recompiles the frame
function (the analog of rebuilding Vulkan pipelines on resize,
renderer/src/renderer/pipelines.rs:16-40).
"""

from __future__ import annotations

from dataclasses import dataclass, fields, replace


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclass(frozen=True)
class RenderConfig:
    width: int = 1280
    height: int = 720
    # 1/2/4/8 at the Vulkan standard sample locations. The reference library
    # accepts any device-supported attachment_sample_count
    # (pipelines.rs:20-27); its sandbox picks 4 (main.rs:114-115).
    msaa_samples: int = 1

    # Raster kernel tiling. A tile is the pixel block one Pallas grid step
    # owns; (sublane, lane)-aligned so every edge-function evaluation is a
    # native VPU op. tile_h x tile_w pixels, padded screen.
    tile_h: int = 32
    tile_w: int = 128
    # Triangles are processed in vectorized chunks of this size inside the
    # raster kernel (coverage for all chunk triangles evaluated at once).
    tri_chunk: int = 8

    # Capacity of the padded triangle stream (post setup/cull). Scenes are
    # padded up to this; must be a multiple of tri_chunk.
    max_triangles: int = 1 << 19

    # Capacity of the (tile, triangle) pair list produced by tile binning;
    # 0 disables binning (every tile scans the whole stream — debug only,
    # opaque geometry only). Pairs are the RAGGED expansion (per-tile-row
    # edge-plane windows, binning.bin_triangle_classes), so this tracks
    # actual coverage, not the bbox.
    pair_capacity: int = 1 << 18
    # Capacity of the intermediate (triangle, tile-row) expansion feeding
    # the ragged pair expansion. Demand-fed like pair_capacity (stat
    # total_rows, overflow stat row_overflow → Renderer grow/shrink).
    row_capacity: int = 1 << 18

    # Fragment layers captured per pixel for alpha-cutoff (masked) and
    # blended geometry (raster/layers.py). The reference blends unbounded
    # (src-alpha over, pipelines.rs:112-132); 4 layers keep stacks of
    # translucent surfaces exact up to depth 4 per sample, with deeper
    # stacks truncated LOUDLY (frame stats blended_saturated_px) AND
    # auto-grown at runtime: under the Renderer's "auto"/"sync" policies the
    # layer counts track the measured per-pixel demand (stats
    # *_demand_max), growing toward the reference's unbounded behavior and
    # shrinking back to this configured floor with hysteresis
    # (engine/renderer.py _grow_layer_capacity).
    mask_layers: int = 4
    blend_layers: int = 4

    # UI overlay pass (raster/ui_stage.py): max overlapping UI fragments
    # composited per pixel (window bg + text + borders rarely exceeds 3) and
    # the (tile, triangle) pair capacity of the UI binning.
    ui_layers: int = 4
    ui_pair_capacity: int = 1 << 14
    # Evaluate UI coverage at the MSAA sample positions (the reference draws
    # ImGui into the multisampled geometry target, so UI edges are
    # antialiased — pipeline_parameters.rs IMGUI + render pass Geometry).
    # Shading/attributes stay at pixel centers (hardware non-sample-rate
    # shading) and clip-rect discard stays per pixel. False (default)
    # evaluates coverage at pixel centers only — sub-pixel difference on
    # glyph/border edges, one shade pass per layer instead of msaa_samples.
    ui_msaa: bool = False

    # Nearest-first z-ordering of the OPAQUE bin streams (the early-Z
    # analog; the reference gets early depth rejection from fixed-function
    # hardware, pipelines.rs:152-158). Each opaque pair carries a
    # conservative-nearest-depth bucket as a low-order component of the
    # binning sort key (NO extra sort), so the raster kernel — whose depth
    # merge is an order-invariant lexicographic (z, id) max — sees near
    # geometry first and its per-sub-chunk conservative depth test skips
    # occluded work. Bit-identical images for ANY value (pinned:
    # tests/test_zorder.py + fuzz/goldens); purely a
    # work-skipping lever, biggest on overdraw-heavy scenes. 1 disables
    # (pure submission order).
    opaque_z_buckets: int = 16

    # MSAA shading dedup: shade at most this many distinct solid triangles
    # per pixel across the 4 samples (layered passes get layers+this-1).
    # 3 is exact for any pixel where ≤3 triangles meet; pixels needing more
    # fall back to the first candidate and are counted in frame stats
    # (shade_clamped_px). Raise to 4 for bit-exact supersampled shading —
    # or let the Renderer's "auto"/"sync" policies grow it toward the
    # measured per-pixel demand (stats shade_demand_max) and shrink back to
    # this floor, like every other capacity knob.
    msaa_shade_candidates: int = 3

    # Two-mip (trilinear) texture filtering — reference sampler parity
    # (descriptors.rs:90-105); False = bilinear + nearest mip (faster).
    trilinear: bool = True
    # Anisotropic filtering taps along the major UV-footprint axis (the
    # reference enables sampler anisotropy at the device's
    # max_sampler_anisotropy — typically 16, descriptors.rs:100-101 +
    # physical_device_features.rs:29-56); 1 = isotropic. The DEFAULT is the
    # reference device's 16 — a default RenderConfig renders the
    # pixel-accurate configuration; fast_sampler() opts into the cheaper
    # 4-tap mode.
    aniso_samples: int = 16
    # sRGB decode per bilinear tap (True = exact hardware filter order,
    # VK_FORMAT_*_SRGB semantics, the DEFAULT) vs decode-after-filter
    # (False, 4-8x fewer pow() evaluations, deviation pinned by
    # tests/test_srgb_filter_order.py — the fast_sampler() opt-in).
    srgb_per_tap: bool = True
    # bf16 texture filtering + lighting (double VPU throughput; texel
    # addressing, depth, edges and compositing stay f32 — raster/shade.py).
    # Goldens within tolerance: tests/test_bf16_shading.py.
    bf16_shading: bool = False
    # HBM ceiling for the stacked deferred-shading calls: the [C, H, W]
    # candidate stacks gather [C, H, W, 3, 4] vertex attributes and dozens
    # of [C, H, W, 4] texture taps — at 1080p x several candidates the live
    # set exceeds a v5e's 16 GB. Stacks whose C*H*W exceeds this element
    # budget are shaded in ceil-sized tile-row strips via lax.map plus an
    # optional shorter remainder strip (at most two traced shading
    # subgraphs in the HLO), bounding live shading memory to ~budget*48B
    # regardless of resolution/candidate count. 0 disables stripping.
    # The per-pixel math is identical; the eager/interpret frame is pinned
    # BIT-equal (tests/test_engine.py::test_shade_strips_bit_equal), while
    # the jitted lax.map branch is pinned at >0.999 pixel agreement
    # (ULP-level XLA fusion differences across strip boundaries,
    # test_shade_strips_jitted_lax_map_matches). NOTE: this default makes
    # common configs (1080p msaa4 with 3 candidates) take the striped path;
    # its device-time cost is unmeasurable through the tunnel (TIMINGS.md)
    # — re-time on direct-attached hardware before tuning the budget.
    shade_strip_elems: int = 1 << 21

    def exact_sampler(self) -> "RenderConfig":
        """The reference device's exact sampler configuration: per-tap sRGB
        decode + 16x anisotropy (descriptors.rs:90-105). This IS the
        default since round 5 — kept as an explicit spelling (and to undo a
        fast_sampler)."""
        return replace(self, srgb_per_tap=True, aniso_samples=16)

    def fast_sampler(self) -> "RenderConfig":
        """Cheaper opt-in sampler: decode-after-filter sRGB + 4x anisotropy
        (4-8x fewer pow() evaluations, fewer taps). Bounded deviation from
        the exact default is pinned by tests/test_srgb_filter_order.py and
        the mini-sandbox goldens."""
        return replace(self, srgb_per_tap=False, aniso_samples=4)

    @property
    def padded_width(self) -> int:
        return _round_up(self.width, self.tile_w)

    @property
    def padded_height(self) -> int:
        return _round_up(self.height, self.tile_h)

    @property
    def tiles_x(self) -> int:
        return self.padded_width // self.tile_w

    @property
    def tiles_y(self) -> int:
        return self.padded_height // self.tile_h

    def validate(self) -> "RenderConfig":
        assert self.msaa_samples in (1, 2, 4, 8), "MSAA must be 1, 2, 4 or 8"
        assert self.msaa_shade_candidates >= 1
        assert self.opaque_z_buckets >= 1
        assert self.tile_w % 128 == 0, "tile_w must be lane-aligned (128)"
        assert self.tile_h % 8 == 0, "tile_h must be sublane-aligned (8)"
        assert self.max_triangles % self.tri_chunk == 0
        return self

    def with_resolution(self, width: int, height: int) -> "RenderConfig":
        return replace(self, width=width, height=height)


def _memoized_config_hash(self: RenderConfig) -> int:
    """RenderConfig rides every frame dispatch as a static jit key, so it is
    hashed once per frame; memoize the field-tuple hash on first use (the
    instance is frozen — equal configs hash equal, same as the dataclass-
    generated implementation)."""
    h = self.__dict__.get("_hash_cache")
    if h is None:
        h = hash(tuple(self.__dict__[f.name] for f in fields(self)))
        object.__setattr__(self, "_hash_cache", h)
    return h


# assigned post-definition: @dataclass(frozen=True) installs its generated
# __hash__ on the class regardless of a body-level definition
RenderConfig.__hash__ = _memoized_config_hash  # type: ignore[method-assign]
