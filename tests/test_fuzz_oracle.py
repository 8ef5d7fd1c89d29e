"""Randomized triangle-soup fuzz vs the independent numpy oracle: N random
single-triangle meshes (random screen positions, depths, windings) rendered
in draw-id debug mode must match the oracle's per-pixel WINNER — coverage,
back-face culling, reverse-Z GREATER_OR_EQUAL depth resolution, and
later-draw-wins ties, all at once (the reference gets these from fixed
hardware state, pipelines.rs:112-158; here every piece is reimplemented, so
the black-box product of all of them is fuzzed against per-pixel barycentric
loops that share no code with the kernels). The MSAA4 case additionally
fuzzes per-sample coverage at the standard positions, the shade-once
candidate dedup, and the tonemap-then-AVERAGE resolve."""

import numpy as np
import pytest

import renderer_tpu as rt
from renderer_tpu.core import math3d
from tests import np_reference

W, H = 128, 96
N_TRIS = 24


@pytest.fixture(scope="module")
def soup():
    """Random soup + everything the oracle needs: f16-quantized clip
    triangles in the renderer's sorted dispatch order."""
    rng = np.random.default_rng(11)
    registry = rt.MaterialRegistry()
    builder = rt.VertexLibraryBuilder()
    tris_f64 = []
    meshes = []
    for i in range(N_TRIS):
        p = np.empty((3, 3), np.float32)
        p[:, 0] = rng.uniform(-0.7, 0.7, 3)
        p[:, 1] = rng.uniform(-0.7, 0.7, 3)
        p[:, 2] = rng.uniform(0.4, 2.0, 3)  # in front of the demo camera
        uv = np.zeros((3, 2), np.float32)
        nrm = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
        tan = np.tile(np.array([[1, 0, 0, 1]], np.float32), (3, 1))
        meshes.append(builder.add_mesh(p, uv, nrm, tan,
                                       np.arange(3, dtype=np.uint32)))
        # oracle sees the f16-quantized positions the library stores
        tris_f64.append(p.astype(np.float16).astype(np.float64))
    builder.build()
    material = registry.create_material(
        "fuzz", rt.PbrMaterialParameters(base_color_factor=(1, 1, 1, 1))
    )

    def make_scene():
        scene = rt.Scene()
        for m in meshes:
            assert scene.queue_mesh(m, material, None, math3d.IDENTITY)
        return scene

    scene = make_scene()
    # oracle order = the renderer's sorted dispatch order (distinct meshes →
    # no instance merge → debug_id = sorted draw index)
    order = sorted(range(N_TRIS), key=lambda i: scene.draws[i].sort_key())
    proj, view = scene.camera.proj_view(W, H, scene.world_space)
    pv = proj @ view
    clip = np.stack([
        (pv @ np.vstack([tris_f64[i].T, np.ones(3)])).T for i in order
    ])
    return registry, make_scene, clip


def _debug_palette() -> np.ndarray:
    """The vertex stage's hashed draw color (shade.draw_debug_colors, f32
    parity), linear — tonemapping is applied per test to match the resolve
    order."""
    import jax.numpy as jnp

    from renderer_tpu.raster import shade

    return np.asarray(
        shade.draw_debug_colors(jnp.arange(N_TRIS, dtype=jnp.int32))
    ).astype(np.float64)


def _aces(x):
    return np.clip((x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14),
                   0, 1)


def _srgb_u8(linear):
    enc = np.where(linear <= 0.0031308, linear * 12.92,
                   1.055 * np.maximum(linear, 1e-9) ** (1 / 2.4) - 0.055)
    return np.round(np.clip(enc, 0, 1) * 255).astype(np.uint8)


def test_random_triangle_soup_matches_oracle(soup):
    registry, make_scene, clip = soup
    renderer = rt.Renderer(
        registry, rt.RenderConfig(width=W, height=H, msaa_samples=1)
    )
    img = np.asarray(renderer.render_frame(make_scene(), debug_mode=2))

    tid_ref, _, _ = np_reference.rasterize(clip, W, H)
    palette = _debug_palette()
    mapped = np.zeros((H, W, 3))
    covered = tid_ref >= 0
    mapped[covered] = _aces(palette[tid_ref[covered]] * 0.8)
    expected = _srgb_u8(mapped)

    # Pixel-exact winner agreement away from triangle boundaries: edge
    # pixels legitimately differ (fill-rule band vs the oracle's >= 0 test),
    # and the hash colors may differ by 1 u8 step (f32 vs f64 sin). Demand
    # 98% of ALL pixels match within 1 step — a wrong depth test, winding,
    # or draw-order bug flips entire triangle interiors, not edge slivers.
    match = (np.abs(img.astype(int) - expected.astype(int)) <= 1).all(axis=-1)
    assert match.mean() > 0.98, f"winner agreement {match.mean():.4f}"
    # sanity: the soup covers a meaningful area with many distinct winners
    # (~half the draws are back-face culled; several more hide behind others)
    assert covered.mean() > 0.2
    assert len(np.unique(tid_ref[covered])) > 5


def test_random_triangle_soup_matches_oracle_msaa4(soup):
    """MSAA4: per-sample winner at the standard sample positions, ACES per
    sample, AVERAGE resolve, then sRGB encode (post.tonemap order).
    msaa_shade_candidates=4 makes the shade-once dedup exact for every
    pixel, so only the fill-rule boundary band may disagree."""
    from renderer_tpu.raster.pipeline import MSAA4_POSITIONS

    registry, make_scene, clip = soup
    renderer = rt.Renderer(
        registry,
        rt.RenderConfig(width=W, height=H, msaa_samples=4,
                        msaa_shade_candidates=4),
    )
    img = np.asarray(renderer.render_frame(make_scene(), debug_mode=2))

    palette = _debug_palette()
    mapped_sum = np.zeros((H, W, 3))
    for off in MSAA4_POSITIONS:
        tid_s, _, _ = np_reference.rasterize(clip, W, H, sample_offset=off)
        m = np.zeros((H, W, 3))
        cov = tid_s >= 0
        m[cov] = _aces(palette[tid_s[cov]] * 0.8)
        mapped_sum += m
    expected = _srgb_u8(mapped_sum / 4.0)

    # sRGB-encoding a 4-sample average amplifies small per-sample
    # differences near black — allow 2 u8 steps.
    match = (np.abs(img.astype(int) - expected.astype(int)) <= 2).all(axis=-1)
    assert match.mean() > 0.98, f"msaa4 resolve agreement {match.mean():.4f}"
