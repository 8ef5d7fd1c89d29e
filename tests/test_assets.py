"""Asset pipeline tests: ntex decode, glTF loading (testbox.glb is the only
complete real asset in the reference checkout), proxy geometry, skinned
character animation, atlas packing/sampling."""

from pathlib import Path

import numpy as np
import pytest

import renderer_tpu as rt
from renderer_tpu.assets import gltf_loader, ntex
from renderer_tpu.core import math3d
from renderer_tpu.materials import atlas as atlas_mod
from renderer_tpu.scene import draw_stream

REF = Path("/root/reference/examples/sandbox/src")
needs_assets = pytest.mark.skipif(not REF.exists(), reason="reference assets not mounted")


@needs_assets
class TestNtex:
    def test_decode_header_and_mips(self):
        data = (REF / "smol-ame-by-seafoam/terrariumtex.ntex").read_bytes()
        header, mips = ntex.decode(data)
        assert header.vk_format in (ntex.VK_FORMAT_BC7_UNORM, ntex.VK_FORMAT_BC7_SRGB)
        assert len(mips) == header.mip_levels
        assert mips[0].shape == (header.height, header.width, 4)
        for i in range(1, len(mips)):
            assert mips[i].shape[0] == max(header.height >> i, 1)
        # non-degenerate content
        assert mips[0].std() > 1.0

    def test_rejects_bad_magic(self):
        with pytest.raises(ntex.NtexDecodeError):
            ntex.decode_header(b"\0" * 2048)


@needs_assets
class TestTestboxGlb:
    @pytest.fixture(scope="class")
    def loaded(self):
        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        gltf = gltf_loader.load_gltf(REF / "testbox/testbox.glb", builder, registry)
        return registry, builder.build(), gltf

    def test_structure(self, loaded):
        registry, library, gltf = loaded
        assert len(gltf.materials) == 1
        assert len(gltf.meshes) == 1
        assert library.vertex_count > 0 and library.index_count % 3 == 0
        # embedded PNG decoded with a full mip chain
        tex = gltf.textures[0]
        assert len(tex.mips) > 5
        assert tex.mips[0].shape[2] == 4

    def test_renders(self, loaded):
        registry, library, gltf = loaded
        # aim the camera at the mesh bounds
        lo = library.positions.min(axis=0)
        hi = library.positions.max(axis=0)
        center = (lo + hi) / 2
        size = float(np.linalg.norm(hi - lo))
        scene = rt.Scene(world_space=rt.GLTF)
        eye = center + np.array([0.0, 0.3 * size, 1.2 * size], np.float32)
        pos, orient = math3d.look_at(eye, center, np.array([0.0, 1.0, 0.0]))
        # look_at returns VULKAN-convention basis; convert for GLTF world:
        scene.camera.position = pos
        scene.camera.orientation = orient
        gltf.queue(scene, math3d.IDENTITY)
        renderer = rt.Renderer(registry, rt.RenderConfig(width=128, height=96))
        img = renderer.render_frame(scene, debug_mode=1)
        assert (img.sum(axis=-1) > 0).mean() > 0.05


class TestSkinnedCharacter:
    @pytest.fixture(scope="class")
    def character(self):
        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        from renderer_tpu.assets import proxy

        gltf = proxy.make_skinned_character(builder, registry, n_joints=4,
                                            segments=8, radial=6)
        return registry, builder.build(), gltf

    def test_palettes_change_over_time(self, character):
        registry, _, gltf = character
        anim = gltf.animations[0]
        palettes = []
        for t in (0.0, 0.5):
            scene = rt.Scene()
            gltf.queue_animated(scene, math3d.IDENTITY, [(t, anim)])
            palettes.append(scene.joint_palette[:4].copy())
            assert len(scene.draws) == 1
            assert scene.draws[0].joints_offset == 0
        assert not np.allclose(palettes[0], palettes[1])

    def test_bind_pose_identity_joints(self, character):
        # At t=0 every bone's sway angle is sin(phase)·…; bone 0 has phase 0 →
        # rotation ≈ 0 → joint 0 = bind @ inverse_bind ≈ identity.
        registry, _, gltf = character
        scene = rt.Scene()
        gltf.queue_animated(scene, math3d.IDENTITY, [(0.0, gltf.animations[0])])
        np.testing.assert_allclose(scene.joint_palette[0], np.eye(4), atol=1e-5)

    def test_skinned_render_differs_over_time(self, character):
        registry, _, gltf = character
        renderer = rt.Renderer(registry, rt.RenderConfig(width=128, height=96))
        imgs = []
        for t in (0.0, 0.6):
            scene = rt.Scene(world_space=rt.GLTF)
            eye, orient = math3d.look_at(
                np.array([0.0, 0.5, 2.0]), np.array([0.0, 0.5, 0.0]),
                np.array([0.0, 1.0, 0.0]),
            )
            scene.camera.position = eye
            scene.camera.orientation = orient
            gltf.queue_animated(scene, math3d.IDENTITY, [(t, gltf.animations[0])])
            imgs.append(renderer.render_frame(scene, debug_mode=3))
        covered = (imgs[0].sum(-1) > 0).mean()
        assert covered > 0.02
        assert (imgs[0] != imgs[1]).any()


class TestFastAnimationParity:
    """The vectorized single-animation pose path (_fast_node_transforms /
    _CompiledAnimation) against the sequential per-node oracle
    (_animated_transform + explicit hierarchy walk)."""

    @pytest.fixture(scope="class")
    def gltf(self):
        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        from renderer_tpu.assets import proxy

        return proxy.make_skinned_character(builder, registry, n_joints=5,
                                            segments=8, radial=6)

    def _sequential_walk(self, gltf, playing):
        transforms = [None] * len(gltf.nodes)
        stack = [(n, math3d.IDENTITY) for n in gltf.root_nodes]
        while stack:
            ni, parent = stack.pop()
            current = parent @ gltf._animated_transform(ni, playing)
            transforms[ni] = current
            for child in gltf.nodes[ni].children:
                stack.append((child, current))
        return transforms

    def test_matches_sequential(self, gltf):
        anim = gltf.animations[0]
        times = np.linspace(0.0, anim.end_time, 16, dtype=np.float32)
        for t in [0.0, 1e-4, *times[:-1].tolist(), anim.end_time - 1e-4]:
            fast = gltf._fast_node_transforms([(float(t), anim)])
            assert fast is not None
            mats, valid = fast
            oracle = self._sequential_walk(gltf, [(float(t), anim)])
            assert valid.all()
            for ni, m in enumerate(oracle):
                np.testing.assert_allclose(
                    mats[ni], m, atol=2e-6, rtol=1e-5,
                    err_msg=f"node {ni} at t={t}",
                )

    def test_step_and_scale_channels(self, gltf):
        # mutate one node's channels to exercise STEP interpolation and the
        # scale path (+ last-write-wins duplicate), then force a recompile
        import copy

        anim0 = gltf.animations[0]
        anim = gltf_loader.Animation(
            "mutated", anim0.start_time, anim0.end_time,
            copy.deepcopy(anim0.nodes_channels),
        )
        for channels in anim.nodes_channels:
            if channels:
                ch = channels[0]
                channels[0] = gltf_loader.AnimationChannel(
                    "STEP", ch.path, ch.times, ch.values
                )
                tt = np.array([0.0, anim.end_time], np.float32)
                channels.append(gltf_loader.AnimationChannel(
                    "LINEAR", "scale", tt,
                    np.array([[1.0, 1.0, 1.0], [2.0, 0.5, 1.5]], np.float32),
                ))
                # duplicate (node, path): the later channel must win
                channels.append(gltf_loader.AnimationChannel(
                    "LINEAR", "scale", tt,
                    np.array([[1.0, 2.0, 1.0], [0.5, 1.0, 2.0]], np.float32),
                ))
                break
        for t in (0.0, 0.37 * anim.end_time, 0.93 * anim.end_time):
            fast = gltf._fast_node_transforms([(float(t), anim)])
            assert fast is not None
            mats, valid = fast
            oracle = self._sequential_walk(gltf, [(float(t), anim)])
            for ni, m in enumerate(oracle):
                np.testing.assert_allclose(
                    mats[ni], m, atol=2e-6, rtol=1e-5,
                    err_msg=f"node {ni} at t={t}",
                )

    def test_past_end_raises(self, gltf):
        anim = gltf.animations[0]
        with pytest.raises(gltf_loader.AnimationError):
            gltf._fast_node_transforms([(float(anim.end_time) + 1.0, anim)])


class TestLayeredAnimationParity:
    """N ≥ 2 playing animations (the demo plays ALL of a model's animations,
    main.rs:565-571): the layered fast path — native anim_pose_multi and the
    numpy fallback — against the sequential per-node oracle, which
    re-decomposes the accumulated transform per animation
    (lib.rs:199-230)."""

    @pytest.fixture(scope="class")
    def gltf(self):
        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        from renderer_tpu.assets import proxy

        return proxy.make_skinned_character(builder, registry, n_joints=5,
                                            segments=8, radial=6)

    def _oracle(self, gltf, playing):
        transforms = [None] * len(gltf.nodes)
        stack = [(n, math3d.IDENTITY) for n in gltf.root_nodes]
        while stack:
            ni, parent = stack.pop()
            current = parent @ gltf._animated_transform(ni, playing)
            transforms[ni] = current
            for child in gltf.nodes[ni].children:
                stack.append((child, current))
        return transforms

    def _check(self, gltf, playing):
        fast = gltf._fast_node_transforms(playing)
        assert fast is not None, "layered path must not fall back"
        mats, valid = fast
        oracle = self._oracle(gltf, playing)
        assert valid.all()
        for ni, m in enumerate(oracle):
            np.testing.assert_allclose(
                mats[ni], m, atol=2e-6, rtol=1e-5, err_msg=f"node {ni}"
            )

    def test_two_animations_match_oracle(self, gltf):
        sway, bob = gltf.animations[0], gltf.animations[1]
        for ts, tb in [(0.0, 0.0), (0.7, 1.3), (1.9, 2.9), (1e-4, 0.5)]:
            self._check(gltf, [(ts, sway), (tb, bob)])

    def test_order_matters_and_matches(self, gltf):
        sway, bob = gltf.animations[0], gltf.animations[1]
        self._check(gltf, [(1.1, bob), (0.4, sway)])
        a = gltf._fast_node_transforms([(1.1, bob), (0.4, sway)])[0]
        b = gltf._fast_node_transforms([(0.4, sway), (1.1, bob)])[0]
        # sway overrides bob's translations when played second
        assert not np.allclose(a, b)

    def test_same_animation_twice(self, gltf):
        anim = gltf.animations[0]
        self._check(gltf, [(0.0, anim), (0.1, anim)])

    def test_numpy_fallback_matches(self, gltf, monkeypatch):
        from renderer_tpu.tools import native

        monkeypatch.setattr(native, "make_anim_pose_multi",
                            lambda *a, **k: None)
        gltf._multi_cache = None  # drop any cached native sampler
        sway, bob = gltf.animations[0], gltf.animations[1]
        self._check(gltf, [(0.7, sway), (1.3, bob)])
        self._check(gltf, [(0.0, sway), (0.1, sway)])
        gltf._multi_cache = None  # don't leak the stubbed cache entry

    def test_past_end_raises_with_anim_index(self, gltf):
        sway, bob = gltf.animations[0], gltf.animations[1]
        with pytest.raises(gltf_loader.AnimationError, match="bob"):
            gltf._fast_node_transforms(
                [(0.5, sway), (float(bob.end_time) + 1.0, bob)]
            )

    def test_three_layers(self, gltf):
        sway, bob = gltf.animations[0], gltf.animations[1]
        self._check(gltf, [(0.3, sway), (1.0, bob), (1.7, sway)])


def _make_cubic(ch, rng):
    """Convert a LINEAR channel to CUBICSPLINE with Catmull-Rom-ish tangents
    plus deterministic noise (so the tangent terms actually matter)."""
    v = np.asarray(ch.values, np.float32)
    t = np.asarray(ch.times, np.float64)
    tan = np.zeros_like(v)
    if len(t) > 1:
        tan[1:-1] = ((v[2:] - v[:-2]).T / (t[2:] - t[:-2]).astype(np.float32)).T
    noise = rng.normal(size=v.shape).astype(np.float32) * 0.15
    return gltf_loader.AnimationChannel(
        "CUBICSPLINE", ch.path, ch.times, v,
        in_tangents=tan + noise, out_tangents=tan - noise,
    )


class TestCubicSplineParity:
    """CUBICSPLINE across all three samplers (sequential oracle, vectorized
    numpy, native C++) — a capability superset: the reference comments the
    mode out of its enum (gltf_json.rs:235-236) and rejects such files."""

    @pytest.fixture(scope="class")
    def gltf(self):
        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        from renderer_tpu.assets import proxy

        g = proxy.make_skinned_character(builder, registry, n_joints=5,
                                         segments=8, radial=6)
        # rebuild animation 0 with every channel cubic (rotation AND the
        # translation/scale paths), appending a cubic scale channel too
        rng = np.random.default_rng(7)
        anim0 = g.animations[0]
        channels = [
            [_make_cubic(ch, rng) for ch in chs] if chs else None
            for chs in anim0.nodes_channels
        ]
        for chs in channels:
            if chs:
                tt = np.array([0.0, float(anim0.end_time)], np.float32)
                sv = np.array([[1, 1, 1], [1.4, 0.8, 1.1]], np.float32)
                chs.append(_make_cubic(gltf_loader.AnimationChannel(
                    "LINEAR", "scale", tt, sv), rng))
                break
        g.animations.append(gltf_loader.Animation(
            "cubic", anim0.start_time, anim0.end_time, channels))
        return g

    def _oracle(self, gltf, playing):
        transforms = [None] * len(gltf.nodes)
        stack = [(n, math3d.IDENTITY) for n in gltf.root_nodes]
        while stack:
            ni, parent = stack.pop()
            current = parent @ gltf._animated_transform(ni, playing)
            transforms[ni] = current
            for child in gltf.nodes[ni].children:
                stack.append((child, current))
        return transforms

    def _check(self, gltf, playing):
        fast = gltf._fast_node_transforms(playing)
        assert fast is not None
        mats, valid = fast
        oracle = self._oracle(gltf, playing)
        assert valid.all()
        for ni, m in enumerate(oracle):
            np.testing.assert_allclose(
                mats[ni], m, atol=2e-6, rtol=1e-5, err_msg=f"node {ni}"
            )

    def test_native_matches_oracle(self, gltf):
        cubic = gltf.animations[-1]
        for t in (0.0, 1e-4, 0.37 * cubic.end_time, 0.93 * cubic.end_time):
            self._check(gltf, [(float(t), cubic)])

    def test_numpy_fallback_matches_oracle(self, gltf, monkeypatch):
        from renderer_tpu.tools import native

        monkeypatch.setattr(native, "make_anim_pose", lambda *a, **k: None)
        cubic = gltf.animations[-1]
        cubic._compiled = None  # drop any cached native sampler
        for t in (0.0, 0.41 * cubic.end_time, 0.88 * cubic.end_time):
            self._check(gltf, [(float(t), cubic)])
        cubic._compiled = None  # don't leak the stubbed sampler

    def test_layered_with_linear(self, gltf):
        sway, cubic = gltf.animations[0], gltf.animations[-1]
        self._check(gltf, [(0.6, cubic), (1.2, sway)])
        self._check(gltf, [(1.2, sway), (0.6, cubic)])

    def test_rotation_stays_normalized(self, gltf):
        cubic = gltf.animations[-1]
        comp = gltf_loader._CompiledAnimation(cubic, gltf.nodes)
        t = 0.43 * cubic.end_time
        mats = comp.local_matrices(float(t), "cubic")
        # every animated local's 3x3 must be a pure rotation * scale with
        # orthogonal columns — only true if the quaternion was renormalized
        for m in mats:
            r = np.asarray(m[:3, :3], np.float64)
            scale = np.linalg.norm(r, axis=0)
            rot = r / scale
            np.testing.assert_allclose(rot.T @ rot, np.eye(3), atol=1e-5)


class TestAnimationInterpolation:
    def _channel(self, interp="LINEAR"):
        times = np.array([1.0, 2.0, 4.0], np.float32)
        values = np.array([[0, 0, 0], [1, 0, 0], [3, 0, 0]], np.float32)
        return gltf_loader.AnimationChannel(interp, "translation", times, values)

    def test_linear(self):
        ch = self._channel()
        np.testing.assert_allclose(
            gltf_loader._interpolate(ch, 1.5, "t"), [0.5, 0, 0], atol=1e-6
        )
        np.testing.assert_allclose(
            gltf_loader._interpolate(ch, 3.0, "t"), [2.0, 0, 0], atol=1e-6
        )

    def test_step(self):
        ch = self._channel("STEP")
        np.testing.assert_allclose(
            gltf_loader._interpolate(ch, 1.9, "t"), [0, 0, 0], atol=1e-6
        )

    def test_clamp_before_first(self):
        ch = self._channel()
        np.testing.assert_allclose(
            gltf_loader._interpolate(ch, 0.0, "t"), [0, 0, 0], atol=1e-6
        )

    def test_error_past_end(self):
        # Parity: sampling at/after the last keyframe is an error
        # (gltf_json.rs:246-259 returns None → InvalidAnimationTimestamp).
        ch = self._channel()
        with pytest.raises(gltf_loader.AnimationError):
            gltf_loader._interpolate(ch, 4.0, "t")

    def _cubic_channel(self, path="translation"):
        w = 4 if path == "rotation" else 3
        times = np.array([1.0, 2.0, 4.0], np.float32)
        rng = np.random.default_rng(3)
        values = rng.normal(size=(3, w)).astype(np.float32)
        if path == "rotation":
            values /= np.linalg.norm(values, axis=1, keepdims=True)
        return gltf_loader.AnimationChannel(
            "CUBICSPLINE", path, times, values,
            in_tangents=rng.normal(size=(3, w)).astype(np.float32),
            out_tangents=rng.normal(size=(3, w)).astype(np.float32),
        )

    def test_cubic_matches_spec_formula(self):
        # independent literal evaluation of the glTF-spec Hermite basis
        ch = self._cubic_channel()
        time, k, d = 1.5, 0, 1.0
        s = (time - 1.0) / d
        expect = (
            (2 * s**3 - 3 * s**2 + 1) * ch.values[k].astype(np.float64)
            + d * (s**3 - 2 * s**2 + s) * ch.out_tangents[k].astype(np.float64)
            + (-2 * s**3 + 3 * s**2) * ch.values[k + 1].astype(np.float64)
            + d * (s**3 - s**2) * ch.in_tangents[k + 1].astype(np.float64)
        )
        got = gltf_loader._interpolate(ch, time, "t")
        np.testing.assert_allclose(got, expect.astype(np.float32), atol=0)
        # second span has d = 2 — the span length scales the tangent terms
        time, k, d = 3.0, 1, 2.0
        s = (time - 2.0) / d
        expect = (
            (2 * s**3 - 3 * s**2 + 1) * ch.values[k].astype(np.float64)
            + d * (s**3 - 2 * s**2 + s) * ch.out_tangents[k].astype(np.float64)
            + (-2 * s**3 + 3 * s**2) * ch.values[k + 1].astype(np.float64)
            + d * (s**3 - s**2) * ch.in_tangents[k + 1].astype(np.float64)
        )
        np.testing.assert_allclose(
            gltf_loader._interpolate(ch, time, "t"),
            expect.astype(np.float32), atol=0,
        )

    def test_cubic_rotation_normalized_and_exact_at_keyframes(self):
        ch = self._cubic_channel("rotation")
        got = gltf_loader._interpolate(ch, 1.7, "t")
        np.testing.assert_allclose(np.linalg.norm(got), 1.0, atol=1e-6)
        # at a keyframe the stored value comes back EXACTLY (no renormalize)
        np.testing.assert_array_equal(
            gltf_loader._interpolate(ch, 2.0, "t"), ch.values[1]
        )

    def test_cubic_clamp_before_first(self):
        ch = self._cubic_channel()
        np.testing.assert_array_equal(
            gltf_loader._interpolate(ch, 0.5, "t"), ch.values[0]
        )


class TestAtlas:
    def test_pack_and_lookup(self):
        registry = rt.MaterialRegistry()
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (16, 32, 4), np.uint8).astype(np.uint8)
        tex = rt.Texture([img, img[::2, ::2]], rt.TextureKind.LINEAR_COLOR, "t")
        registry.register_texture(tex)
        at = atlas_mod.build_atlas(registry)
        x, y, w, h = at.table[tex.slot, 0]
        assert (w, h) == (32, 16)
        # region content matches
        region = at.data[y : y + h, x : x + w]
        expected = (
            img[..., 0].astype(np.uint32)
            | (img[..., 1].astype(np.uint32) << 8)
            | (img[..., 2].astype(np.uint32) << 16)
            | (img[..., 3].astype(np.uint32) << 24)
        )
        np.testing.assert_array_equal(region, expected)
        # wrap border: texel left of the region equals the rightmost column
        np.testing.assert_array_equal(at.data[y : y + h, x - 1], expected[:, -1])
        np.testing.assert_array_equal(at.data[y : y + h, x + w], expected[:, 0])
        # missing mips point at the last real mip
        assert tuple(at.table[tex.slot, 5][2:]) == (16, 8)

    def test_bundle_cache_roundtrip(self, tmp_path, monkeypatch):
        monkeypatch.setenv("RENDERER_TPU_CACHE", str(tmp_path))

        def make():
            registry = rt.MaterialRegistry()
            rng = np.random.default_rng(1)
            img = rng.integers(0, 255, (16, 32, 4), np.uint8).astype(np.uint8)
            tex = rt.Texture([img, img[::2, ::2]], rt.TextureKind.SRGB_COLOR, "t")
            registry.register_texture(tex)
            return registry

        cold = atlas_mod.build_atlas(make())
        assert atlas_mod._atlas_cache_file(make()).exists()
        warm = atlas_mod.build_atlas(make())
        np.testing.assert_array_equal(cold.data, warm.data)
        np.testing.assert_array_equal(cold.table, warm.table)
        np.testing.assert_array_equal(cold.srgb, warm.srgb)
        np.testing.assert_allclose(cold.flat, warm.flat)
        # different content → different cache key
        registry2 = rt.MaterialRegistry()
        img2 = np.zeros((16, 32, 4), np.uint8)
        registry2.register_texture(
            rt.Texture([img2], rt.TextureKind.SRGB_COLOR, "t")
        )
        assert atlas_mod._atlas_cache_file(registry2) != \
            atlas_mod._atlas_cache_file(make())

    def test_lazy_texture_defers_decode(self):
        calls = []

        def loader():
            calls.append(1)
            return [np.full((4, 8, 4), 7, np.uint8)]

        tex = rt.Texture(None, rt.TextureKind.LINEAR_COLOR, "z",
                         loader=loader, shape=(4, 8), fingerprint="fp-z")
        assert (tex.width, tex.height) == (8, 4)
        assert tex.fingerprint == "fp-z"
        assert not calls
        assert tex.mips[0].shape == (4, 8, 4)
        assert calls == [1]
        tex.mips  # memoized
        assert calls == [1]

    def test_default_textures_present(self):
        registry = rt.MaterialRegistry()
        at = atlas_mod.build_atlas(registry)
        # slot 0 = white base color 1x1
        x, y, w, h = at.table[0, 0]
        assert (w, h) == (1, 1)
        assert at.data[y, x] == 0xFFFFFFFF
        assert at.srgb[0] == 1 and at.srgb[1] == 0


class TestNativeQueuePrologue:
    """The one-call native queue_animated prologue (csrc anim_prologue:
    pose sampling + joint palettes + the per-draw transform block) must be
    BIT-compatible with the numpy fast path it replaces — same scene SoA,
    same palette, same refusal/raise semantics."""

    @staticmethod
    def _snapshot(scene):
        n = scene._n
        return (scene._keys[:n].copy(), scene._transforms[:n].copy(),
                scene._material_id[:n].copy(),
                scene._joints_offset[:n].copy(), scene._skinned[:n].copy(),
                scene._morph_weights[:n].copy(), scene.joint_palette.copy(),
                scene._joint_cursor)

    def _both_paths(self, gltf, playing, transform):
        from renderer_tpu.tools import native

        gltf.invalidate_caches()
        sc_native = rt.Scene(world_space=rt.GLTF)
        ok_native = gltf.queue_animated(sc_native, transform, playing)
        cache = getattr(gltf, "_prologue_cache", None)
        assert cache and all(v is not None for v in cache.values()), (
            "native prologue path must engage (not fall back)"
        )
        a = self._snapshot(sc_native)

        gltf.invalidate_caches()
        orig = native.make_anim_prologue
        native.make_anim_prologue = lambda *args, **kw: None
        try:
            sc_numpy = rt.Scene(world_space=rt.GLTF)
            ok_numpy = gltf.queue_animated(sc_numpy, transform, playing)
        finally:
            native.make_anim_prologue = orig
            gltf.invalidate_caches()
        b = self._snapshot(sc_numpy)

        assert ok_native == ok_numpy
        for name, x, y in zip(
            ("keys", "transforms", "material_id", "joints_offset", "skinned",
             "morph_weights", "palette", "joint_cursor"), a, b,
        ):
            if isinstance(x, np.ndarray):
                np.testing.assert_array_equal(x, y, err_msg=name)
            else:
                assert x == y, name

    def test_proxy_character_bit_equal(self):
        from renderer_tpu.assets import proxy

        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        gltf = proxy.make_skinned_character(builder, registry, n_joints=5,
                                            segments=8, radial=6)
        tr = math3d.trs(np.array([0.3, 0.0, -0.2], np.float32),
                        np.array([0, 0, 0, 1], np.float32),
                        np.array([1.1, 1.0, 0.9], np.float32))
        for times in [(0.0, 0.0), (0.7, 1.3), (1.9, 0.4)]:
            playing = [(t % a.end_time, a)
                       for t, a in zip(times, gltf.animations)]
            self._both_paths(gltf, playing, tr)

    def test_loader_fixture_skins_and_morphs_bit_equal(self):
        """Real-byte fixture: 2 skins + weights channels — palettes for
        several skins and per-draw morph weights must match through the
        native block path."""
        from tests.make_loader_fixture import GLTF_PATH

        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        gltf = gltf_loader.load_gltf(GLTF_PATH, builder, registry)
        assert len(gltf.skins) >= 2 and gltf.has_morph
        for times in [(0.0, 0.0), (0.5, 0.25)]:
            playing = [(t % a.end_time, a)
                       for t, a in zip(times, gltf.animations)]
            self._both_paths(gltf, playing, math3d.IDENTITY)

    def test_single_animation_bit_equal(self):
        """N=1 goes through the same layered prologue (the multi semantics
        reduce to the single-animation path for one animation)."""
        from renderer_tpu.assets import proxy

        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        gltf = proxy.make_skinned_character(builder, registry, n_joints=4,
                                            segments=6, radial=5)
        self._both_paths(gltf, [(0.6, gltf.animations[0])], math3d.IDENTITY)

    def test_past_end_raises_with_anim_name(self):
        from renderer_tpu.assets import proxy

        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        gltf = proxy.make_skinned_character(builder, registry, n_joints=4,
                                            segments=6, radial=5)
        bad = float(gltf.animations[1].end_time) + 1.0
        scene = rt.Scene(world_space=rt.GLTF)
        with pytest.raises(gltf_loader.AnimationError, match="bob"):
            gltf.queue_animated(scene, math3d.IDENTITY,
                                [(0.1, gltf.animations[0]),
                                 (bad, gltf.animations[1])])
        # nothing was drawn, so nothing may leak: a caller that catches the
        # error and requeues must see the same scene the numpy paths leave
        # (they raise BEFORE allocating; the native path rolls back)
        assert scene._joint_cursor == 0
        assert scene.draw_count == 0

    def test_pooled_scene_requeue_reuses_block(self):
        """clear() + re-queue (the interactive loop) must hit the cached
        combined DrawBlock (same joint offsets every frame) and produce the
        identical draw stream."""
        from renderer_tpu.assets import proxy

        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        gltf = proxy.make_skinned_character(builder, registry, n_joints=5,
                                            segments=8, radial=6)
        playing = [(0.2, a) for a in gltf.animations]
        scene = rt.Scene(world_space=rt.GLTF)
        gltf.queue_animated(scene, math3d.IDENTITY, playing)
        first = self._snapshot(scene)
        entry = next(iter(gltf._prologue_cache.values()))
        assert len(entry["blocks"]) == 1
        scene.clear()
        gltf.queue_animated(scene, math3d.IDENTITY, playing)
        assert len(entry["blocks"]) == 1  # cache hit, no rebuild
        for x, y in zip(first, self._snapshot(scene)):
            if isinstance(x, np.ndarray):
                np.testing.assert_array_equal(x, y)
            else:
                assert x == y
