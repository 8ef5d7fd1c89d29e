"""Randomized triangle-soup fuzz vs the independent numpy oracle: N random
single-triangle meshes (random screen positions, depths, windings) rendered
in draw-id debug mode must match the oracle's per-pixel WINNER — coverage,
back-face culling, reverse-Z GREATER_OR_EQUAL depth resolution, and
later-draw-wins ties, all at once (the reference gets these from fixed
hardware state, pipelines.rs:112-158; here every piece is reimplemented, so
the black-box product of all of them is fuzzed against per-pixel barycentric
loops that share no code with the kernels)."""

import numpy as np

import renderer_tpu as rt
from renderer_tpu.core import math3d
from tests import np_reference

W, H = 128, 96


def _debug_colors_u8(tid_img: np.ndarray, n_draws: int) -> np.ndarray:
    """Expected u8 image: the vertex stage's hashed draw color
    (shade.draw_debug_colors, f32 parity) through ACES at exposure 0.8."""
    import jax.numpy as jnp

    from renderer_tpu.raster import shade

    palette = np.asarray(
        shade.draw_debug_colors(jnp.arange(n_draws, dtype=jnp.int32))
    )  # [N,3] f32
    out = np.zeros((*tid_img.shape, 3), np.uint8)
    covered = tid_img >= 0
    out[covered] = np_reference.aces_srgb_u8(palette[tid_img[covered]])
    return out


def test_random_triangle_soup_matches_oracle():
    rng = np.random.default_rng(11)
    registry = rt.MaterialRegistry()
    builder = rt.VertexLibraryBuilder()
    n = 24
    tris_f64 = []
    meshes = []
    for i in range(n):
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
    renderer = rt.Renderer(
        registry, rt.RenderConfig(width=W, height=H, msaa_samples=1)
    )
    scene = rt.Scene()
    for m in meshes:
        assert scene.queue_mesh(m, material, None, math3d.IDENTITY)
    img = np.asarray(renderer.render_frame(scene, debug_mode=2))

    # oracle over the SAME sorted order the renderer dispatches (distinct
    # meshes → no instance merge → debug_id = sorted draw index)
    order = sorted(range(n), key=lambda i: scene.draws[i].sort_key())
    proj, view = scene.camera.proj_view(W, H, scene.world_space)
    pv = proj @ view
    clip = np.stack([
        (pv @ np.vstack([tris_f64[i].T, np.ones(3)])).T for i in order
    ])
    tid_ref, _, _ = np_reference.rasterize(clip, W, H)
    expected = _debug_colors_u8(tid_ref, n)

    # Pixel-exact winner agreement away from triangle boundaries: edge
    # pixels legitimately differ (fill-rule band vs the oracle's >= 0 test),
    # and the hash colors may differ by 1 u8 step (f32 vs f64 sin). Demand
    # 98% of ALL pixels match within 1 step — a wrong depth test, winding,
    # or draw-order bug flips entire triangle interiors, not edge slivers.
    match = (np.abs(img.astype(int) - expected.astype(int)) <= 1).all(axis=-1)
    agreement = match.mean()
    assert agreement > 0.98, f"winner agreement {agreement:.4f}"
    # sanity: the soup actually covers a meaningful area with many winners
    assert (tid_ref >= 0).mean() > 0.2
    # ~half the soup is back-face culled; several more hide behind winners
    assert len(np.unique(tid_ref[tid_ref >= 0])) > 5
