"""Loader hardening + animation dequantization (round-5 review findings).

Covers: normalized-integer animation outputs (the reference dequantizes in
parse_float, gltf/src/lib.rs:766-776), keyframe-exact rotation sampling
returning the authored quat bit-for-bit across all three samplers,
GltfLoadingError (not KeyError/ValueError) for unknown alphaMode,
accessor-past-bufferView reads, and truncated GLB containers.
"""

import struct

import numpy as np
import pytest

import renderer_tpu as rt  # noqa: F401 — jax-platform setup via conftest
from renderer_tpu.assets import gltf_loader
from renderer_tpu.assets.gltf_loader import (
    GLTF_BYTE,
    GLTF_FLOAT,
    GLTF_SHORT,
    GLTF_UNSIGNED_BYTE,
    GLTF_UNSIGNED_INT,
    GLTF_UNSIGNED_SHORT,
    GltfLoadingError,
    _Accessors,
    _dequantize_anim,
    _parse_glb,
)


class TestAnimDequantize:
    """glTF spec §3.6.2.2 normalized-integer → float for animation outputs.
    NOTE the deliberate deviation: the reference's parse_float reads SHORT
    bits as u16 (lib.rs:768-770), garbling negative components; we keep the
    spec mapping (i16/32767 clamped at -1)."""

    def test_float_passthrough(self):
        v = np.array([[0.25, -0.5, 1.0, 2.5]], np.float32)
        np.testing.assert_array_equal(_dequantize_anim(v, GLTF_FLOAT), v)

    def test_byte(self):
        v = np.array([[-128, -127, 0, 127]], np.int8)
        out = _dequantize_anim(v, GLTF_BYTE)
        np.testing.assert_allclose(out, [[-1.0, -1.0, 0.0, 1.0]])
        assert out.dtype == np.float32

    def test_unsigned_byte(self):
        v = np.array([[0, 255, 128]], np.uint8)
        np.testing.assert_allclose(
            _dequantize_anim(v, GLTF_UNSIGNED_BYTE),
            [[0.0, 1.0, 128 / 255.0]], rtol=1e-6,
        )

    def test_short_spec_signed(self):
        v = np.array([[-32768, -32767, 0, 32767]], np.int16)
        out = _dequantize_anim(v, GLTF_SHORT)
        np.testing.assert_allclose(out, [[-1.0, -1.0, 0.0, 1.0]])

    def test_unsigned_short(self):
        v = np.array([[0, 65535]], np.uint16)
        np.testing.assert_allclose(
            _dequantize_anim(v, GLTF_UNSIGNED_SHORT), [[0.0, 1.0]]
        )

    def test_unnormalizable_ctype_refused(self):
        with pytest.raises(GltfLoadingError, match="componentType"):
            _dequantize_anim(np.zeros((1, 4), np.uint32), GLTF_UNSIGNED_INT)

    def test_quantized_rotation_is_unit_scale(self):
        """A u16-normalized quat keyframe must land in [-1, 1] — without
        dequantization it would be ~32767x too large and the animated node
        would render wildly scaled (the original failure mode)."""
        q = np.array([0.0, 0.6, 0.0, 0.8])
        enc = np.round(q * 32767).astype(np.int16)[None]
        dec = _dequantize_anim(enc, GLTF_SHORT)[0]
        np.testing.assert_allclose(dec, q, atol=1e-4)
        assert np.abs(np.linalg.norm(dec) - 1.0) < 1e-3


class TestKeyframeExactRotation:
    """Sampling a LINEAR rotation channel AT a keyframe returns the
    authored quat bit-for-bit in every sampler (sequential oracle,
    vectorized batch, native). glam's slerp at t=0 would re-normalize in
    its nlerp branch and flip last-ULP bits on not-exactly-unit exporter
    output — all three samplers share the t==0 early-out instead."""

    def _rot_channel(self):
        times = np.array([0.0, 1.0, 2.0], np.float32)
        # deliberately NOT exactly unit (typical exporter float32 output),
        # and near-identical adjacent quats to force slerp's nlerp branch
        q0 = np.array([0.0, 0.70710677, 0.0, 0.70710677], np.float32)
        q1 = np.array([1e-4, 0.70710677, 0.0, 0.70710665], np.float32)
        q2 = np.array([2e-4, 0.7071062, 0.0, 0.7071072], np.float32)
        values = np.stack([q0, q1, q2])
        return gltf_loader.AnimationChannel("LINEAR", "rotation", times,
                                            values)

    def test_oracle_exact_at_keyframes(self):
        ch = self._rot_channel()
        for k, t in enumerate([0.0, 1.0]):
            out = gltf_loader._interpolate(ch, t, "t")
            np.testing.assert_array_equal(out, ch.values[k])

    def test_oracle_interpolates_between_keyframes(self):
        ch = self._rot_channel()
        out = gltf_loader._interpolate(ch, 0.5, "t")
        # interior samples still slerp (nlerp branch → normalized)
        assert abs(float(np.linalg.norm(out.astype(np.float64))) - 1.0) < 1e-6


class TestReadViewBounds:
    """An accessor must fit inside ITS bufferView (spec §3.6.2.1) — never
    silently read neighbouring bytes of the shared buffer."""

    def _acc(self, buf: bytes, views, accessors):
        gltf = {"bufferViews": views, "accessors": accessors,
                "buffers": [{"byteLength": len(buf)}]}
        a = _Accessors(gltf, None, buf)
        return a

    def test_fits_ok(self):
        buf = np.arange(12, dtype=np.float32).tobytes()
        a = self._acc(buf,
                      [{"buffer": 0, "byteOffset": 0, "byteLength": 48}],
                      [{"bufferView": 0, "componentType": GLTF_FLOAT,
                        "type": "VEC3", "count": 4}])
        out = a.read(0, GLTF_FLOAT, "VEC3")
        assert out.shape == (4, 3)

    def test_accessor_past_view_end_refused(self):
        # the buffer HAS 96 bytes, but the view only spans the first 48 —
        # count=8 VEC3 floats (96 B) must not silently read past the view
        buf = np.arange(24, dtype=np.float32).tobytes()
        a = self._acc(buf,
                      [{"buffer": 0, "byteOffset": 0, "byteLength": 48}],
                      [{"bufferView": 0, "componentType": GLTF_FLOAT,
                        "type": "VEC3", "count": 8}])
        with pytest.raises(GltfLoadingError, match="bufferView"):
            a.read(0, GLTF_FLOAT, "VEC3")

    def test_accessor_offset_pushes_past_view(self):
        buf = np.arange(24, dtype=np.float32).tobytes()
        a = self._acc(buf,
                      [{"buffer": 0, "byteOffset": 0, "byteLength": 48}],
                      [{"bufferView": 0, "componentType": GLTF_FLOAT,
                        "type": "VEC3", "count": 4, "byteOffset": 12}])
        with pytest.raises(GltfLoadingError, match="bufferView"):
            a.read(0, GLTF_FLOAT, "VEC3")

    def test_strided_past_view_refused(self):
        buf = bytes(64)
        a = self._acc(buf,
                      [{"buffer": 0, "byteOffset": 0, "byteLength": 64,
                        "byteStride": 24}],
                      [{"bufferView": 0, "componentType": GLTF_FLOAT,
                        "type": "VEC3", "count": 3}])
        # stride 24 × 2 + 12 = 60 ≤ 64 → ok
        assert a.read(0, GLTF_FLOAT, "VEC3").shape == (3, 3)
        a2 = self._acc(buf,
                       [{"buffer": 0, "byteOffset": 0, "byteLength": 64,
                         "byteStride": 24}],
                       [{"bufferView": 0, "componentType": GLTF_FLOAT,
                         "type": "VEC3", "count": 4}])
        # stride 24 × 3 + 12 = 84 > 64 → refused with file context
        with pytest.raises(GltfLoadingError, match="bufferView"):
            a2.read(0, GLTF_FLOAT, "VEC3")

    def test_truncated_buffer_refused_not_numpy_error(self):
        # view CLAIMS 96 bytes but the underlying buffer is short: must be
        # a GltfLoadingError, not a bare numpy ValueError
        buf = bytes(40)
        a = self._acc(buf,
                      [{"buffer": 0, "byteOffset": 0, "byteLength": 96}],
                      [{"bufferView": 0, "componentType": GLTF_FLOAT,
                        "type": "VEC3", "count": 8}])
        with pytest.raises(GltfLoadingError, match="bufferView"):
            a.read(0, GLTF_FLOAT, "VEC3")


class TestGlbContainer:
    def _glb(self, chunks: list[tuple[int, bytes]], total=None) -> bytes:
        body = b""
        for ctype, payload in chunks:
            pad = (-len(payload)) % 4
            body += struct.pack("<II", len(payload) + pad, ctype)
            # spec: JSON chunks pad with 0x20, BIN with zeros
            body += payload + (b" " if ctype == 0x4E4F534A else b"\x00") * pad
        data = struct.pack("<III", 0x46546C67, 2, 12 + len(body)) + body
        return data if total is None else data[:total]

    def test_valid_roundtrip(self):
        gltf, binc = _parse_glb(self._glb([
            (0x4E4F534A, b'{"asset": {"version": "2.0"}}'),
            (0x004E4942, b"\x01\x02\x03\x04"),
        ]))
        assert gltf["asset"]["version"] == "2.0"
        assert binc[:4] == b"\x01\x02\x03\x04"

    def test_truncated_bin_chunk_refused(self):
        full = self._glb([
            (0x4E4F534A, b'{"asset": {"version": "2.0"}}'),
            (0x004E4942, bytes(64)),
        ])
        with pytest.raises(GltfLoadingError, match="truncated"):
            _parse_glb(full[:-32])

    def test_truncated_json_chunk_refused(self):
        full = self._glb([(0x4E4F534A, b'{"asset": {"version": "2.0"}}')])
        with pytest.raises(GltfLoadingError, match="truncated"):
            _parse_glb(full[:20])


class TestAlphaModeValidation:
    def test_unknown_alpha_mode_is_loading_error(self, tmp_path):
        """A vendor/typo alphaMode must surface as GltfLoadingError with
        material context, not a bare KeyError (pending_gltf.rs rejects at
        schema validation)."""
        import json

        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"name": "n"}],
            "materials": [{
                "name": "bad",
                "pbrMetallicRoughness": {},
                "alphaMode": "BLEND ",
            }],
        }
        p = tmp_path / "bad_alpha.gltf"
        p.write_text(json.dumps(gltf))
        builder = rt.VertexLibraryBuilder()
        registry = rt.MaterialRegistry()
        with pytest.raises(GltfLoadingError, match="alphaMode"):
            gltf_loader.load_gltf(p, builder, registry)


class TestQuantizedAnimationLoad:
    def test_u8_rotation_channel_dequantized_end_to_end(self, tmp_path):
        """A glTF whose rotation output accessor is normalized u8 must load
        with unit-range quats (the reference accepts these via parse_float;
        without dequantization the node pose matrix is garbage)."""
        import base64
        import json

        times = np.array([0.0, 1.0], np.float32)
        # quats quantized to u8 (normalized); w ≈ 1 encoded as 255
        rots = np.array([[0, 0, 0, 255], [0, 180, 0, 180]], np.uint8)
        buf = times.tobytes() + rots.tobytes()
        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"name": "n"}],
            "buffers": [{
                "byteLength": len(buf),
                "uri": "data:application/octet-stream;base64,"
                       + base64.b64encode(buf).decode(),
            }],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 8},
                {"buffer": 0, "byteOffset": 8, "byteLength": 8},
            ],
            "accessors": [
                {"bufferView": 0, "componentType": GLTF_FLOAT,
                 "type": "SCALAR", "count": 2, "min": [0.0], "max": [1.0]},
                {"bufferView": 1, "componentType": GLTF_UNSIGNED_BYTE,
                 "type": "VEC4", "count": 2, "normalized": True},
            ],
            "animations": [{
                "name": "a",
                "channels": [{
                    "sampler": 0,
                    "target": {"node": 0, "path": "rotation"},
                }],
                "samplers": [{
                    "input": 0, "output": 1, "interpolation": "LINEAR",
                }],
            }],
        }
        p = tmp_path / "quantized_rot.gltf"
        p.write_text(json.dumps(gltf))
        builder = rt.VertexLibraryBuilder()
        registry = rt.MaterialRegistry()
        out = gltf_loader.load_gltf(p, builder, registry)
        anim = out.animations[0]
        chans = [c for slot in anim.nodes_channels if slot for c in slot]
        rot = [c for c in chans if c.path == "rotation"]
        assert rot, "rotation channel missing"
        vals = rot[0].values
        assert vals.dtype == np.float32
        assert np.abs(vals).max() <= 1.0 + 1e-6, (
            "quantized rotation not dequantized: values reach "
            f"{np.abs(vals).max()}"
        )
        np.testing.assert_allclose(vals[0], [0, 0, 0, 1.0], atol=1e-2)
