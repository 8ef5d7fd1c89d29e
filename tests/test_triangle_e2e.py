"""End-to-end golden tests on the triangle demo (the reference's smoke test,
examples/triangle/src/main.rs), cross-validated against the independent
numpy rasterizer in np_reference.py."""

import numpy as np
import pytest

import renderer_tpu as rt
from apps.triangle import build_scene, build_triangle_assets
from renderer_tpu.core import math3d
from tests import np_reference

W, H = 256, 192  # small for CPU interpret-mode speed


@pytest.fixture(scope="module")
def assets():
    return build_triangle_assets()


@pytest.fixture(scope="module")
def rendered(assets):
    registry, meshes, material = assets
    renderer = rt.Renderer(registry, rt.RenderConfig(width=W, height=H))
    scene = build_scene(meshes, material)
    imgs = {m: renderer.render_frame(scene, debug_mode=m) for m in (1, 2, 3)}
    return renderer, scene, imgs


def reference_tris(scene):
    """Clip-space triangles via independent numpy math."""
    proj, view = scene.camera.proj_view(W, H, scene.world_space)
    tris = []
    base = np.array(
        [[-0.5, 0.5, 0.8], [0.5, 0.5, 0.8], [-0.1, -0.5, 0.8]], np.float64
    )
    # quantization parity: positions go through f16
    base = base.astype(np.float16).astype(np.float64)
    for d in scene.draws:
        m = d.transform.astype(np.float64)
        world = (m[:3, :3] @ base.T).T + m[:3, 3]
        clip = (proj @ view @ np.vstack([world.T, np.ones(3)])).T
        tris.append(clip)
    return np.stack(tris)


class TestTriangleE2E:
    def test_coverage_matches_reference_rasterizer(self, rendered):
        _, scene, imgs = rendered
        draws = sorted(scene.draws, key=lambda d: d.sort_key())
        ordered = rt.Scene()
        ordered.draws = draws
        tid_ref, _, _ = np_reference.rasterize(reference_tris(ordered), W, H)
        covered_ref = tid_ref >= 0
        covered = imgs[2].sum(axis=-1) > 0
        # Edge pixels may differ; demand >99.5% agreement.
        agreement = (covered == covered_ref).mean()
        assert agreement > 0.995, f"coverage agreement {agreement}"
        assert covered.sum() > 0.05 * W * H

    def test_base_color_mode_flat_green(self, rendered):
        _, _, imgs = rendered
        img = imgs[1]
        covered = img.sum(axis=-1) > 0
        expected = np_reference.aces_srgb_u8(np.array([0.2, 0.8, 0.2]))
        pix = img[covered]
        assert (np.abs(pix.astype(int) - expected[None, :]) <= 1).all(), (
            f"got {np.unique(pix, axis=0)[:4]}, want {expected}"
        )

    def test_draw_id_mode_two_flat_colors(self, rendered):
        _, _, imgs = rendered
        img = imgs[2]
        covered = img.sum(axis=-1) > 0
        colors = np.unique(img[covered], axis=0)
        assert len(colors) == 2, f"expected 2 draw-id colors, got {len(colors)}"

    def test_normals_mode_interpolates(self, rendered):
        _, _, imgs = rendered
        img = imgs[3]
        covered = img.sum(axis=-1) > 0
        # Normals X/Y/Z at the corners → smoothly varying colors.
        colors = np.unique(img[covered], axis=0)
        assert len(colors) > 100

    def test_depth_order_second_draw_wins_ties(self, rendered):
        # Both triangles sit at z=0.8; where they overlap, the later draw in
        # sorted order (mesh2, GREATER_OR_EQUAL depth test) must win.
        _, scene, imgs = rendered
        img = imgs[2]
        covered = img.sum(axis=-1) > 0
        ordered = rt.Scene()
        ordered.camera = scene.camera
        ordered.draws = sorted(scene.draws, key=lambda d: d.sort_key())
        tid_ref, _, _ = np_reference.rasterize(reference_tris(ordered), W, H)
        # Every pixel the oracle assigns to the later triangle must be one
        # single flat draw-id color (the later draw's), i.e. the earlier
        # triangle never shows through in the overlap.
        overlap_colors = np.unique(img[(tid_ref == 1) & covered], axis=0)
        assert len(overlap_colors) == 1


class TestDrawStream:
    def test_instance_merge_shares_debug_id(self, assets):
        registry, meshes, material = assets
        scene = rt.Scene()
        # Two draws of the same mesh+material merge into one instanced
        # command → same debug draw id (renderer.rs:236-254).
        scene.queue_mesh(meshes[0], material, None, math3d.IDENTITY)
        scene.queue_mesh(meshes[0], material, None, math3d.trs(translation=np.array([1, 0, 0.0])))
        scene.queue_mesh(meshes[1], material, None, math3d.IDENTITY)
        from renderer_tpu.scene import draw_stream

        arrays = draw_stream.build_frame_arrays(scene)
        assert arrays["debug_id"][0] == arrays["debug_id"][1]
        assert arrays["debug_id"][2] != arrays["debug_id"][0]

    def test_draw_call_cap(self, assets):
        registry, meshes, material = assets
        scene = rt.Scene()
        for _ in range(rt.MAX_DRAW_CALLS):
            assert scene.queue_mesh(meshes[0], material, None, math3d.IDENTITY)
        assert not scene.queue_mesh(meshes[0], material, None, math3d.IDENTITY)

    def test_joint_palette_exhaustion(self, assets):
        scene = rt.Scene()
        off, buf = scene.allocate_joint_offset(1000)
        assert off == 0 and buf.shape == (1000, 4, 4)
        assert scene.allocate_joint_offset(25) is None
        off2, _ = scene.allocate_joint_offset(24)
        assert off2 == 1000
