"""Morph-target (blend-shape) rendering: delta banks in the vertex library,
per-draw weights through the frame blob, displacement in the vertex stage.

This is a capability the reference never implemented — its weights-channel
evaluation is a todo!() (gltf/src/lib.rs:229) and CUBICSPLINE weights are
unreachable — so the contract here is the glTF spec: morphed position =
base + Σ w_k·Δpos_k applied BEFORE skinning and the model transform;
morphed normal = normalize(n + Σ w_k·Δn_k).

Bit-exactness strategy: base positions, deltas and weights are chosen
exactly representable in f16/f32, so `base + w·Δ` computed on device equals
the same value baked into a second mesh's positions at build time — the
two renders must be IDENTICAL, pixel for pixel.
"""

import numpy as np
import pytest

import renderer_tpu as rt
from renderer_tpu.core import constants, math3d

W, H = 128, 96


def _quad_arrays(z=1.5, half=0.5):
    positions = np.array(
        [[-half, half, z], [half, half, z], [-half, -half, z], [half, -half, z]],
        np.float32,
    )
    uvs = np.array([[0, 1], [1, 1], [0, 0], [1, 0]], np.float32)
    normals = np.tile([0, 0, -1.0], (4, 1)).astype(np.float32)
    tangents = np.tile([1, 0, 0, 1.0], (4, 1)).astype(np.float32)
    indices = np.array([0, 1, 2, 2, 1, 3], np.uint32)
    return positions, uvs, normals, tangents, indices


# exactly-representable deltas (multiples of 2^-3) and weights (2^-1, 2^-2)
DELTA0 = np.array(
    [[0.25, 0.0, 0], [0.25, 0.0, 0], [0.25, -0.25, 0], [0.25, -0.25, 0]],
    np.float32,
)
DELTA1 = np.array(
    [[0.0, 0.5, 0], [0.0, 0.5, 0], [0.0, 0.0, 0], [0.0, 0.0, 0]],
    np.float32,
)
WEIGHTS = np.array([0.5, 0.25], np.float32)


class TestBankLayout:
    def test_rows_and_sentinel(self):
        builder = rt.VertexLibraryBuilder()
        p, uv, n, t, i = _quad_arrays()
        plain = builder.add_mesh(p, uv, n, t, i)
        morphed = builder.add_mesh(
            p, uv, n, t, i, morph_targets=[(DELTA0, None), (DELTA1, None)]
        )
        lib = builder.build()
        assert plain.morph_count == 0 and morphed.morph_count == 2
        # bank row 0 is the zero sentinel; target k vertex j at row0+k*step
        np.testing.assert_array_equal(lib.morph_pos[0], 0.0)
        assert lib.morph_pos.shape == (1 + 2 * 4, 3)
        o = morphed.vertex_offset
        np.testing.assert_array_equal(lib.morph_row0[o : o + 4],
                                      1 + np.arange(4))
        np.testing.assert_array_equal(lib.morph_step[o : o + 4], 4)
        np.testing.assert_array_equal(lib.morph_pos[1:5], DELTA0)
        np.testing.assert_array_equal(lib.morph_pos[5:9], DELTA1)
        # unmorphed vertices address the sentinel
        np.testing.assert_array_equal(lib.morph_row0[:4], 0)
        np.testing.assert_array_equal(lib.morph_step[:4], 0)

    def test_too_many_targets_refused_loudly(self):
        builder = rt.VertexLibraryBuilder()
        p, uv, n, t, i = _quad_arrays()
        targets = [(DELTA0, None)] * (constants.MAX_MORPH_TARGETS + 1)
        with pytest.raises(ValueError, match="MAX_MORPH_TARGETS"):
            builder.add_mesh(p, uv, n, t, i, morph_targets=targets)


def _render(registry, mesh, weights, debug_mode=3, msaa=1):
    scene = rt.Scene()
    mat = registry.create_material(
        f"m{mesh.mesh_id}-{debug_mode}",
        rt.PbrMaterialParameters(base_color_factor=(1, 1, 1, 1)),
    )
    scene.queue_mesh(mesh, mat, None, math3d.IDENTITY, morph_weights=weights)
    r = rt.Renderer(
        registry, rt.RenderConfig(width=W, height=H, msaa_samples=msaa)
    )
    return r.render_frame(scene, debug_mode=debug_mode)


class TestMorphDisplacement:
    @pytest.fixture(scope="class")
    def assets(self):
        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        p, uv, n, t, i = _quad_arrays()
        morphed = builder.add_mesh(
            p, uv, n, t, i, morph_targets=[(DELTA0, None), (DELTA1, None)]
        )
        baked_pos = p + WEIGHTS[0] * DELTA0 + WEIGHTS[1] * DELTA1
        baked = builder.add_mesh(baked_pos, uv, n, t, i)
        plain = builder.add_mesh(p, uv, n, t, i)
        builder.build()
        return registry, morphed, baked, plain

    def test_weighted_sum_matches_baked_mesh_exactly(self, assets):
        registry, morphed, baked, _plain = assets
        img_m = _render(registry, morphed, WEIGHTS)
        img_b = _render(registry, baked, None)
        assert (img_m.sum(-1) > 0).mean() > 0.05
        np.testing.assert_array_equal(img_m, img_b)

    def test_zero_weights_match_unmorphed_mesh_exactly(self, assets):
        registry, morphed, _baked, plain = assets
        img_m = _render(registry, morphed, None)  # no weights → base shape
        img_p = _render(registry, plain, None)
        np.testing.assert_array_equal(img_m, img_p)

    def test_single_target_weight(self, assets):
        registry, morphed, _baked, _plain = assets
        # weights shorter than morph_count pad with zeros
        img_a = _render(registry, morphed, np.array([0.5], np.float32))
        img_b = _render(registry, morphed, np.array([0.5, 0.0], np.float32))
        np.testing.assert_array_equal(img_a, img_b)


class TestMorphNormals:
    def test_normal_delta_matches_baked_normals(self):
        """morphed normal = normalize(n + Σ w·Δn): compare to a mesh whose
        normals are baked to n + w·Δn (the trailing normalize in the vertex
        stage covers both). Tolerance covers the quantization asymmetry:
        the baked mesh snorm10-quantizes the SUM, the morph path adds an
        f16 delta to the snorm10 base."""
        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        p, uv, n, t, i = _quad_arrays()
        # Δn tilts the quad normal toward +x; w=0.5 → n + (0.5, 0, 0)
        dn = np.tile([1.0, 0, 0], (4, 1)).astype(np.float32)
        morphed = builder.add_mesh(
            p, uv, n, t, i, morph_targets=[(np.zeros((4, 3), np.float32), dn)]
        )
        baked = builder.add_mesh(p, uv, n + 0.5 * dn, t, i)
        builder.build()
        img0 = _render(registry, morphed, None, debug_mode=3)
        img1 = _render(registry, morphed, np.array([0.5], np.float32), 3)
        imgb = _render(registry, baked, None, debug_mode=3)
        assert not np.array_equal(img0, img1), "normal delta must show"
        covered = img1.sum(-1) > 0
        diff = np.abs(img1.astype(int) - imgb.astype(int)).max(-1)
        assert diff[covered].max() <= 3, f"max drift {diff[covered].max()}"


class TestMorphSkinned:
    def test_morph_applies_before_skinning(self):
        """Deltas displace in MESH space, then the joint matrix moves the
        result (glTF order): compare against a baked mesh through the same
        skin path — bit-exact."""
        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        p, uv, n, t, i = _quad_arrays()
        joints = np.zeros((4, 4), np.uint8)
        weights4 = np.zeros((4, 4), np.float32)
        weights4[:, 0] = 1.0
        morphed = builder.add_mesh(
            p, uv, n, t, i, joints=joints, weights=weights4,
            morph_targets=[(DELTA0, None)],
        )
        baked = builder.add_mesh(
            p + 0.5 * DELTA0, uv, n, t, i, joints=joints, weights=weights4
        )
        builder.build()
        mat = registry.create_material(
            "skinned", rt.PbrMaterialParameters(base_color_factor=(1, 1, 1, 1))
        )
        # a joint that translates and rotates — morph must ride through it
        joint = math3d.trs(
            np.array([0.25, 0.1, 0], np.float32),
            np.array([0, 0, np.sin(0.2), np.cos(0.2)], np.float32),
            np.array([1, 1, 1], np.float32),
        )

        def render(mesh, w):
            scene = rt.Scene()
            alloc = scene.allocate_joint_offset(1)
            offset, palette = alloc
            palette[0] = joint
            scene.queue_mesh(mesh, mat, offset, math3d.IDENTITY,
                             morph_weights=w)
            r = rt.Renderer(registry, rt.RenderConfig(width=W, height=H))
            return r.render_frame(scene, debug_mode=1)

        img_m = render(morphed, np.array([0.5], np.float32))
        img_b = render(baked, None)
        assert (img_m.sum(-1) > 0).mean() > 0.05
        np.testing.assert_array_equal(img_m, img_b)


class TestSceneApi:
    def test_too_many_weights_assert(self):
        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        p, uv, n, t, i = _quad_arrays()
        mesh = builder.add_mesh(p, uv, n, t, i,
                                morph_targets=[(DELTA0, None)])
        builder.build()
        mat = registry.create_material(
            "w", rt.PbrMaterialParameters(base_color_factor=(1, 1, 1, 1))
        )
        scene = rt.Scene()
        with pytest.raises(AssertionError, match="MAX_MORPH_TARGETS"):
            scene.queue_mesh(
                mesh, mat, None, math3d.IDENTITY,
                np.zeros(constants.MAX_MORPH_TARGETS + 1, np.float32),
            )

    def test_draw_parameters_round_trip(self):
        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        p, uv, n, t, i = _quad_arrays()
        mesh = builder.add_mesh(p, uv, n, t, i,
                                morph_targets=[(DELTA0, None), (DELTA1, None)])
        builder.build()
        mat = registry.create_material(
            "rt", rt.PbrMaterialParameters(base_color_factor=(1, 1, 1, 1))
        )
        scene = rt.Scene()
        scene.queue_mesh(mesh, mat, None, math3d.IDENTITY, WEIGHTS)
        draws = scene.draws
        np.testing.assert_array_equal(draws[0].morph_weights, WEIGHTS)
        scene2 = rt.Scene()
        scene2.draws = draws
        np.testing.assert_array_equal(
            scene2.draws[0].morph_weights, WEIGHTS
        )


class TestMorphScanBatch:
    def test_scan_batch_with_varying_weights_matches_per_frame(self):
        """Device-resident multi-frame scan with DIFFERENT morph weights per
        frame: each blob's pmw section must drive its own frame's
        displacement (render_frames_device == the per-frame path for every
        batch entry). Near-total agreement, not bit equality — interpret
        mode composes the per-frame path eagerly while the scan is one
        fused jit (see test_engine.test_render_frames_device_matches_single)."""
        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        p, uv, n, t, i = _quad_arrays()
        morphed = builder.add_mesh(
            p, uv, n, t, i, morph_targets=[(DELTA0, None), (DELTA1, None)]
        )
        builder.build()
        mat = registry.create_material(
            "m-scan", rt.PbrMaterialParameters(base_color_factor=(1, 1, 1, 1))
        )
        r = rt.Renderer(registry, rt.RenderConfig(width=W, height=H))

        def scene_at(w0, w1):
            scene = rt.Scene()
            scene.queue_mesh(morphed, mat, None, math3d.IDENTITY,
                             morph_weights=np.array([w0, w1], np.float32))
            return scene

        weight_sets = [(0.0, 0.0), (0.8, 0.0), (0.3, 0.6)]
        scenes = [scene_at(*w) for w in weight_sets]
        imgs, _stats = r.render_frames_device(scenes, debug_mode=3)
        imgs = np.asarray(imgs)
        distinct = {imgs[k].tobytes() for k in range(3)}
        assert len(distinct) == 3  # the weights actually changed the frames
        for k, w in enumerate(weight_sets):
            single = np.asarray(r.render_frame(scene_at(*w), debug_mode=3))
            agreement = (imgs[k] == single).all(axis=-1).mean()
            assert agreement > 0.999, f"frame {k} agreement {agreement}"
