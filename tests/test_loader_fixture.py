"""Real-binary-buffer loader coverage (gltf/src/lib.rs:607-724) on the
committed tests/fixtures/strided.gltf + .bin pair: interleaved byteStride
accessors, tight accessors, u16 + u32 indices, accessor-on-view byte
offsets, u8 joints + f32 weights, MAT4 inverse bind matrices (and the
identity-IBM skin branch), animation sampler accessors, and the embedded
PNG image branch — all decoded from REAL bytes and compared exactly against
the generator's ground-truth arrays (tests/make_loader_fixture.py).

The golden render locks the full load→queue→render path on this data:
    python -m tests.test_loader_fixture regen
"""

from pathlib import Path

import numpy as np
import pytest

import renderer_tpu as rt
from renderer_tpu.assets.gltf_loader import _Accessors, load_gltf
from renderer_tpu.core import math3d
from tests.make_loader_fixture import (
    BIN_PATH,
    GLTF_PATH,
    build,
    expected_arrays,
)

GOLDEN = Path(__file__).parent / "golden" / "loader-fixture-golden.npz"
FLOAT, U8, U16, U32 = 5126, 5121, 5123, 5125


@pytest.fixture(scope="module")
def fixture_files():
    assert GLTF_PATH.exists() and BIN_PATH.exists(), (
        "run python -m tests.make_loader_fixture"
    )
    return GLTF_PATH


@pytest.fixture(scope="module")
def loaded(fixture_files):
    registry = rt.MaterialRegistry()
    builder = rt.VertexLibraryBuilder()
    gltf = load_gltf(fixture_files, builder, registry)
    return registry, builder.build(), gltf


def test_fixture_files_match_generator(fixture_files):
    """The committed bytes are exactly what the generator produces — the
    ground-truth arrays in expected_arrays() describe THESE files."""
    import json

    gltf, blob = build()
    assert BIN_PATH.read_bytes() == blob
    assert json.loads(GLTF_PATH.read_text()) == gltf


class TestAccessorDecoding:
    """_Accessors.read against ground truth for every layout branch."""

    @pytest.fixture(scope="class")
    def acc(self):
        import json

        gltf = json.loads(GLTF_PATH.read_text())
        return gltf, _Accessors(gltf, GLTF_PATH.parent, None)

    def _prim_accessors(self, gltf, mesh_i):
        prim = gltf["meshes"][mesh_i]["primitives"][0]
        return prim["attributes"], prim["indices"]

    def test_interleaved_stride48(self, acc):
        gltf, a = acc
        e = expected_arrays()
        p0, n0, uv0, t0, i0 = e["prim0"]
        attrs, idx = self._prim_accessors(gltf, 0)
        np.testing.assert_array_equal(a.read(attrs["POSITION"], FLOAT, "VEC3"), p0)
        np.testing.assert_array_equal(a.read(attrs["NORMAL"], FLOAT, "VEC3"), n0)
        np.testing.assert_array_equal(a.read(attrs["TEXCOORD_0"], FLOAT, "VEC2"), uv0)
        np.testing.assert_array_equal(a.read(attrs["TANGENT"], FLOAT, "VEC4"), t0)
        got_idx = a.read(idx, U16, "SCALAR")
        np.testing.assert_array_equal(got_idx.reshape(-1), i0)
        assert got_idx.dtype == np.uint16

    def test_tight_with_accessor_offset_and_u32(self, acc):
        gltf, a = acc
        e = expected_arrays()
        p1, n1, uv1, t1, i1, joints, weights = e["prim1"]
        attrs, idx = self._prim_accessors(gltf, 1)
        # POSITION sits 8 dead bytes into its view (accessor byteOffset)
        assert gltf["accessors"][attrs["POSITION"]]["byteOffset"] == 8
        np.testing.assert_array_equal(a.read(attrs["POSITION"], FLOAT, "VEC3"), p1)
        got_idx = a.read(idx, U32, "SCALAR")
        np.testing.assert_array_equal(got_idx.reshape(-1), i1)
        assert got_idx.dtype == np.uint32

    def test_interleaved_u8_joints_f32_weights(self, acc):
        gltf, a = acc
        e = expected_arrays()
        _p, _n, _uv, _t, _i, joints, weights = e["prim1"]
        attrs, _ = self._prim_accessors(gltf, 1)
        # stride 20 mixing u8 and f32 elements in one view
        got_j = a.read(attrs["JOINTS_0"], U8, "VEC4")
        got_w = a.read(attrs["WEIGHTS_0"], FLOAT, "VEC4")
        np.testing.assert_array_equal(got_j, joints)
        np.testing.assert_array_equal(got_w, weights)
        assert got_j.dtype == np.uint8

    def test_sparse_accessor(self, acc):
        """Sparse morph delta: zero base (no bufferView) + u16 indices /
        f32 values overrides decode to the dense ground-truth array."""
        gltf, a = acc
        _d0, _n0, d1 = expected_arrays()["morph"]
        acc_md1 = gltf["meshes"][0]["primitives"][0]["targets"][1]["POSITION"]
        spec = gltf["accessors"][acc_md1]
        assert "sparse" in spec and "bufferView" not in spec
        np.testing.assert_array_equal(a.read(acc_md1, FLOAT, "VEC3"), d1)

    def test_ctype_and_atype_validation(self, acc):
        from renderer_tpu.assets.gltf_loader import GltfLoadingError

        gltf, a = acc
        attrs, idx = self._prim_accessors(gltf, 0)
        with pytest.raises(GltfLoadingError, match="componentType"):
            a.read(attrs["POSITION"], U16, "VEC3")
        with pytest.raises(GltfLoadingError, match="type"):
            a.read(attrs["POSITION"], FLOAT, "VEC2")


class TestLoadedStructure:
    def test_meshes_and_materials(self, loaded):
        _registry, _lib, gltf = loaded
        assert len(gltf.meshes) == 3
        assert [len(prims) for prims in gltf.meshes] == [1, 1, 1]
        assert gltf.meshes[1][0][0].skinned
        assert gltf.meshes[2][0][0].skinned
        assert not gltf.meshes[0][0][0].skinned
        names = [m.name for m in gltf.materials]
        assert names == ["textured", "pink", "masked"]
        # cutoff zero unless MASK (pending_gltf.rs:193)
        assert gltf.materials[2].params.alpha_cutoff == pytest.approx(0.35)
        assert gltf.materials[1].params.alpha_cutoff == 0.0

    def test_two_skins_and_identity_ibms(self, loaded):
        _registry, _lib, gltf = loaded
        e = expected_arrays()
        assert len(gltf.skins) == 2
        sk0, sk1 = gltf.skins
        assert [j.node_index for j in sk0.joints] == [4, 5, 6]
        for i, j in enumerate(sk0.joints):
            np.testing.assert_allclose(j.inverse_bind_matrix, e["ibms"][i],
                                       atol=1e-7)
        # identity-IBM branch (skin without inverseBindMatrices)
        assert [j.node_index for j in sk1.joints] == [7, 8]
        for j in sk1.joints:
            np.testing.assert_array_equal(j.inverse_bind_matrix, np.eye(4))

    def test_animation_channels(self, loaded):
        _registry, _lib, gltf = loaded
        e = expected_arrays()
        times, rot, trans, scale = e["anim"]
        assert len(gltf.animations) == 2
        anim = gltf.animations[0]
        assert anim.name == "wiggle"
        assert anim.start_time == 0.0 and anim.end_time == 1.5
        ch_rot = anim.nodes_channels[5][0]
        assert ch_rot.path == "rotation" and ch_rot.interpolation == "LINEAR"
        np.testing.assert_array_equal(ch_rot.times, times)
        np.testing.assert_array_equal(ch_rot.values, rot)
        ch_tr = anim.nodes_channels[6][0]
        assert ch_tr.path == "translation" and ch_tr.interpolation == "STEP"
        np.testing.assert_array_equal(ch_tr.values, trans)
        ch_sc = anim.nodes_channels[8][0]
        assert ch_sc.path == "scale"
        np.testing.assert_array_equal(ch_sc.values, scale)

    def test_cubicspline_channels(self, loaded):
        """The (in-tangent, value, out-tangent) triples of a CUBICSPLINE
        output accessor are split into the channel's three arrays."""
        _registry, _lib, gltf = loaded
        ct, ctr, crot = expected_arrays()["anim_cubic"]
        anim = gltf.animations[1]
        assert anim.name == "bounce"
        assert anim.start_time == 0.0 and anim.end_time == pytest.approx(1.2)
        ch_tr = gltf.animations[1].nodes_channels[7][0]
        assert ch_tr.interpolation == "CUBICSPLINE"
        np.testing.assert_array_equal(ch_tr.times, ct)
        np.testing.assert_array_equal(ch_tr.in_tangents, ctr[:, 0])
        np.testing.assert_array_equal(ch_tr.values, ctr[:, 1])
        np.testing.assert_array_equal(ch_tr.out_tangents, ctr[:, 2])
        ch_rot = anim.nodes_channels[4][0]
        assert ch_rot.path == "rotation"
        np.testing.assert_array_equal(ch_rot.in_tangents, crot[:, 0])
        np.testing.assert_array_equal(ch_rot.values, crot[:, 1])
        np.testing.assert_array_equal(ch_rot.out_tangents, crot[:, 2])

    def test_morph_targets_loaded(self, loaded):
        """Morph deltas decode from real bytes into the library bank
        (f16-quantized like base positions) with mesh defaults and node
        overrides resolved per the spec."""
        from renderer_tpu.geometry import quantize

        _registry, lib, gltf = loaded
        d0, n0, d1 = expected_arrays()["morph"]
        mesh0 = gltf.meshes[0][0][0]
        assert mesh0.morph_count == 2
        o = mesh0.vertex_offset
        nv = mesh0.vertex_count
        r0 = lib.morph_row0[o : o + nv]
        step = lib.morph_step[o]
        np.testing.assert_array_equal(
            lib.morph_pos[r0], quantize.quantize_position(d0)
        )
        np.testing.assert_array_equal(
            lib.morph_nrm[r0], quantize.quantize_position(n0)
        )
        np.testing.assert_array_equal(
            lib.morph_pos[r0 + step], quantize.quantize_position(d1)
        )
        np.testing.assert_array_equal(lib.morph_nrm[r0 + step], 0.0)
        # node.weights beats mesh.weights
        np.testing.assert_array_equal(
            gltf._node_default_weights(1), [0.5, 0.25]
        )
        np.testing.assert_array_equal(gltf.mesh_weights[0], [0.25, 0.0])

    def test_weight_channels_sample_and_layer(self, loaded):
        """LINEAR [K·T] and CUBICSPLINE [K·3·T] weights channels sample per
        keyframe; a later playing animation's weights override."""
        _registry, _lib, gltf = loaded
        wa, cubic_w = expected_arrays()["morph_anim"]
        wiggle, bounce = gltf.animations
        # LINEAR at the second keyframe exactly
        w = gltf.morph_weights_at([(0.5, wiggle)])
        np.testing.assert_allclose(w[1], wa[1], atol=1e-7)
        # midway between keyframes 1 and 2 → lerp
        w = gltf.morph_weights_at([(0.75, wiggle)])
        np.testing.assert_allclose(w[1], 0.5 * (wa[1] + wa[2]), atol=1e-6)
        # cubic at a keyframe returns the middle (value) element exactly
        w = gltf.morph_weights_at([(0.6, bounce)])
        np.testing.assert_array_equal(w[1], cubic_w[1, 1])
        # layering: the later animation wins the node's weights
        w = gltf.morph_weights_at([(0.75, wiggle), (0.6, bounce)])
        np.testing.assert_array_equal(w[1], cubic_w[1, 1])
        w = gltf.morph_weights_at([(0.6, bounce), (0.75, wiggle)])
        np.testing.assert_allclose(w[1], 0.5 * (wa[1] + wa[2]), atol=1e-6)

    def test_cubic_playback_matches_oracle(self, loaded):
        """Layered LINEAR + CUBICSPLINE playback from real bytes: the fast
        path (native/vectorized) against the sequential per-node oracle."""
        _registry, _lib, gltf = loaded
        playing = [(0.7, gltf.animations[0]), (0.9, gltf.animations[1])]
        fast = gltf._fast_node_transforms(playing)
        assert fast is not None
        mats, valid = fast
        transforms = [None] * len(gltf.nodes)
        stack = [(n, math3d.IDENTITY) for n in gltf.root_nodes]
        while stack:
            ni, parent = stack.pop()
            current = parent @ gltf._animated_transform(ni, playing)
            transforms[ni] = current
            for child in gltf.nodes[ni].children:
                stack.append((child, current))
        for ni, m in enumerate(transforms):
            np.testing.assert_allclose(
                mats[ni], m, atol=2e-6, rtol=1e-5, err_msg=f"node {ni}"
            )

    def test_embedded_png_decoded_with_mips(self, loaded):
        _registry, _lib, gltf = loaded
        tex = gltf.textures[0]
        assert tex.mips[0].shape == (8, 8, 4)
        assert len(tex.mips) == 4  # 8 → 4 → 2 → 1
        yy, xx = np.mgrid[0:8, 0:8]
        np.testing.assert_array_equal(tex.mips[0][..., 0], 32 * xx)
        np.testing.assert_array_equal(tex.mips[0][..., 1], 32 * yy)


def _render():
    registry = rt.MaterialRegistry()
    builder = rt.VertexLibraryBuilder()
    gltf = load_gltf(GLTF_PATH, builder, registry)
    builder.build()
    scene = rt.Scene(world_space=rt.GLTF)
    pos, orient = math3d.look_at(
        np.array([0.3, 1.2, 4.0], np.float32),
        np.array([0.3, 0.5, 0.0], np.float32),
        np.array([0.0, 1.0, 0.0], np.float32),
    )
    scene.camera.position = pos
    scene.camera.orientation = orient
    gltf.queue_animated(
        scene, math3d.IDENTITY,
        [(0.7 % a.end_time, a) for a in gltf.animations],
    )
    renderer = rt.Renderer(
        registry, rt.RenderConfig(width=160, height=96, msaa_samples=4)
    )
    img = renderer.render_frame(scene, debug_mode=0)
    return img, renderer.frame_stats()


def test_golden_render():
    if not GOLDEN.exists():
        pytest.skip("golden not generated (python -m tests.test_loader_fixture regen)")
    img, stats = _render()
    assert sum(v for k, v in stats.items() if "overflow" in k) == 0, stats
    expected = np.load(GOLDEN)["loader-fixture"]
    diff = np.abs(img.astype(int) - expected.astype(int)).max(axis=-1)
    bad = (diff > 2).mean()
    assert bad < 0.005, f"{bad:.2%} of pixels drifted (max {diff.max()})"


def regenerate():
    GOLDEN.parent.mkdir(exist_ok=True)
    img, stats = _render()
    assert (img.sum(-1) > 0).mean() > 0.02, "render must cover pixels"
    np.savez_compressed(GOLDEN, **{"loader-fixture": img})
    print(f"wrote {GOLDEN} (stats: {stats})")


if __name__ == "__main__":
    import sys

    from tests import conftest  # noqa: F401 — force the CPU interpret platform

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regenerate()
