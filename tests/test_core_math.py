"""Unit tests for camera/projection/coordinate-system/quantization parity."""

import numpy as np
import pytest

from renderer_tpu.core import camera, math3d
from renderer_tpu.geometry import quantize


class TestProjection:
    def test_reverse_z_depth_range(self):
        # Reverse-Z: depth(near) = 1, depth(far) = 0 (camera.rs:6-8).
        p = camera.projection_reverse_z(np.radians(74), 16 / 9, 0.1, 100.0)
        for z, expected in [(0.1, 1.0), (100.0, 0.0)]:
            clip = p @ np.array([0, 0, z, 1.0], np.float32)
            assert clip[3] == pytest.approx(z)
            assert clip[2] / clip[3] == pytest.approx(expected, abs=1e-5)

    def test_reverse_z_formula(self):
        # depth(z) = n(f-z) / ((f-n) z)
        n, f = 0.5, 40.0
        p = camera.projection_reverse_z(np.radians(74), 1.0, n, f)
        for z in [0.5, 1.0, 7.3, 39.0]:
            clip = p @ np.array([0.2, -0.3, z, 1.0], np.float32)
            expected = n * (f - z) / ((f - n) * z)
            assert clip[2] / clip[3] == pytest.approx(expected, rel=1e-4, abs=1e-6)

    def test_infinite_far(self):
        # depth(z) = n/z (camera.rs:30-32).
        n = 0.25
        p = camera.projection_reverse_z_inf_far(np.radians(74), 2.0, n)
        for z in [0.25, 1.0, 1e6]:
            clip = p @ np.array([0, 0, z, 1.0], np.float32)
            assert clip[2] / clip[3] == pytest.approx(n / z, rel=1e-5)

    def test_fov_scale(self):
        # x/y scale: sy = 1/tan(fov/2), sx = sy/aspect (camera.rs:35-39).
        p = camera.create_proj(1920, 1080, 0.1, 100.0)
        sy = 1.0 / np.tan(np.radians(74) / 2)
        assert p[1, 1] == pytest.approx(sy, rel=1e-6)
        assert p[0, 0] == pytest.approx(sy / (1920 / 1080), rel=1e-6)

    def test_view_matrix_inverts_camera_pose(self):
        cam = camera.Camera(
            position=np.array([1.0, 2.0, 3.0], np.float32),
            orientation=math3d.quat_from_axis_angle([0, 1, 0], 0.7),
        )
        _, view = cam.proj_view(800, 600)
        # The camera's world position maps to the view-space origin.
        origin = view @ np.array([1.0, 2.0, 3.0, 1.0], np.float32)
        np.testing.assert_allclose(origin[:3], 0.0, atol=1e-5)


class TestCoordinateSystems:
    def test_vulkan_identity(self):
        m = camera.VULKAN.create_transform_to(camera.VULKAN)
        np.testing.assert_allclose(m, np.eye(4), atol=1e-6)

    def test_gltf_to_vulkan(self):
        m = camera.GLTF.create_transform_to(camera.VULKAN)
        # glTF up (+Y) must map to Vulkan up (-Y).
        np.testing.assert_allclose(m @ [0, 1, 0, 0], [0, -1, 0, 0], atol=1e-6)
        # glTF right (-X) must map to Vulkan right (+X).
        np.testing.assert_allclose(m @ [-1, 0, 0, 0], [1, 0, 0, 0], atol=1e-6)
        # forward maps to forward (+Z).
        np.testing.assert_allclose(m @ [0, 0, 1, 0], [0, 0, 1, 0], atol=1e-6)

    def test_quake_roundtrip(self):
        to = camera.QUAKE.create_transform_to(camera.VULKAN)
        back = camera.VULKAN.create_transform_to(camera.QUAKE)
        np.testing.assert_allclose(to @ back, np.eye(4), atol=1e-6)


class TestQuantization:
    def test_f16_roundtrip(self):
        x = np.array([0.1, -1.5, 1000.25, 0.0], np.float32)
        q = quantize.quantize_f16(x)
        np.testing.assert_array_equal(q, x.astype(np.float16).astype(np.float32))

    def test_snorm10_truncates_toward_zero(self):
        # pack<10>(f) = trunc(511 * clamp(f)) (vertex_buffers.rs:107-112).
        assert quantize.quantize_snorm10(np.float32(0.999)) == pytest.approx(510 / 511)
        assert quantize.quantize_snorm10(np.float32(-0.999)) == pytest.approx(-510 / 511)
        assert quantize.quantize_snorm10(np.float32(1.5)) == 1.0
        assert quantize.quantize_snorm10(np.float32(-1.5)) == -1.0
        assert quantize.quantize_snorm10(np.float32(0.0)) == 0.0

    def test_snorm2_tangent_sign(self):
        assert quantize.quantize_snorm2(np.float32(1.0)) == 1.0
        assert quantize.quantize_snorm2(np.float32(-1.0)) == -1.0

    def test_unorm8_weights(self):
        w = np.array([0.0, 0.25, 0.5, 1.0], np.float32)
        q = quantize.quantize_unorm8(w)
        np.testing.assert_allclose(q, np.trunc(w * 255) / 255, atol=1e-7)


class TestQuaternions:
    def test_slerp_endpoints(self):
        a = math3d.quat_from_axis_angle([0, 0, 1], 0.0)
        b = math3d.quat_from_axis_angle([0, 0, 1], 1.0)
        np.testing.assert_allclose(math3d.quat_slerp(a, b, 0.0), a, atol=1e-6)
        np.testing.assert_allclose(math3d.quat_slerp(a, b, 1.0), b, atol=1e-6)

    def test_slerp_halfway_angle(self):
        a = math3d.quat_from_axis_angle([0, 1, 0], 0.0)
        b = math3d.quat_from_axis_angle([0, 1, 0], 1.0)
        mid = math3d.quat_slerp(a, b, 0.5)
        expected = math3d.quat_from_axis_angle([0, 1, 0], 0.5)
        np.testing.assert_allclose(mid, expected, atol=1e-6)

    def test_quat_mat_roundtrip(self):
        q = math3d.quat_from_axis_angle([1, 2, 3], 0.9)
        m = math3d.quat_to_mat3(q)
        q2 = math3d.mat3_to_quat(m)
        assert abs(np.dot(q, q2)) == pytest.approx(1.0, abs=1e-5)
