"""Generate the committed real-binary glTF fixture (tests/fixtures/):
a .gltf + .bin pair exercising every accessor branch of the reference
loader (gltf/src/lib.rs:607-724) on REAL binary buffer data — the branches
the asset mount's missing Sponza/Ame .bin LFS buffers leave untested:

- interleaved vertex attributes via byteStride (pos/normal/uv/tangent in one
  48-byte-stride view; joints u8 + weights f32 in a 20-byte-stride view)
- tightly-packed accessors in the same buffer (the second primitive)
- u16 AND u32 index accessors
- accessor byteOffset on top of bufferView byteOffset
- TWO skins sharing the animation: one with a MAT4 inverseBindMatrices
  accessor, one without (identity IBM branch)
- animation samplers: LINEAR rotation (VEC4), STEP + LINEAR translation
  (VEC3), scale; SCALAR f32 input with min/max; a second animation with
  CUBICSPLINE samplers (3-elements-per-keyframe output accessors)
- morph targets (POSITION+NORMAL and POSITION-only), mesh-level default
  weights overridden by node weights, and weights animation channels in
  both LINEAR ([K·T] flat scalars) and CUBICSPLINE ([K·3·T]) form
- an embedded image via bufferView (PNG)

Deterministic: `python -m tests.make_loader_fixture` rewrites byte-identical
files. The expected arrays are re-derived by tests/test_loader_fixture.py
importing `expected_arrays()` below.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np

FIXTURE_DIR = Path(__file__).parent / "fixtures"
GLTF_PATH = FIXTURE_DIR / "strided.gltf"
BIN_PATH = FIXTURE_DIR / "strided.bin"

FLOAT, U8, U16, U32 = 5126, 5121, 5123, 5125


def expected_arrays() -> dict:
    """The ground-truth attribute arrays, derived deterministically (the
    test compares the loader's decoded accessors against these exactly)."""
    rng = np.random.default_rng(42)

    def grid_mesh(n, offset):
        # n x n grid of positions with deterministic perturbation
        xs, ys = np.meshgrid(
            np.linspace(0, 1, n, dtype=np.float32),
            np.linspace(0, 1, n, dtype=np.float32),
        )
        pos = np.stack(
            [xs.ravel() + offset,
             ys.ravel(),
             rng.normal(size=n * n).astype(np.float32) * 0.05],
            axis=-1,
        ).astype(np.float32)
        nrm = np.tile(np.array([0, 0, 1], np.float32), (n * n, 1))
        nrm += rng.normal(size=(n * n, 3)).astype(np.float32) * 0.01
        uv = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float32)
        tan = np.zeros((n * n, 4), np.float32)
        tan[:, 0] = 1.0
        tan[:, 3] = np.where(np.arange(n * n) % 2 == 0, 1.0, -1.0)
        idx = []
        for r in range(n - 1):
            for c in range(n - 1):
                a = r * n + c
                idx += [a, a + 1, a + n, a + 1, a + n + 1, a + n]
        return pos, nrm, uv, tan, np.asarray(idx, np.uint32)

    p0, n0, uv0, t0, i0 = grid_mesh(5, 0.0)  # prim 0: interleaved + u16
    p1, n1, uv1, t1, i1 = grid_mesh(4, 2.0)  # prim 1: tight + u32, skinned

    v1 = p1.shape[0]
    joints = np.zeros((v1, 4), np.uint8)
    joints[:, 0] = (np.arange(v1) % 3).astype(np.uint8)
    joints[:, 1] = ((np.arange(v1) + 1) % 3).astype(np.uint8)
    weights = np.zeros((v1, 4), np.float32)
    weights[:, 0] = 0.75
    weights[:, 1] = 0.25

    # second skinned primitive (skin 1, 2 joints, no IBM accessor)
    p2, n2, uv2, t2, i2 = grid_mesh(3, -2.0)
    v2 = p2.shape[0]
    joints2 = np.zeros((v2, 4), np.uint8)
    joints2[:, 0] = (np.arange(v2) % 2).astype(np.uint8)
    weights2 = np.zeros((v2, 4), np.float32)
    weights2[:, 0] = 1.0

    ibms = np.stack([
        np.eye(4, dtype=np.float32),
        np.eye(4, dtype=np.float32),
        np.eye(4, dtype=np.float32),
    ])
    ibms[0, 0, 3] = -0.5  # row-major translation; stored column-major below
    ibms[1, 1, 3] = -1.0
    ibms[2, 2, 3] = -0.25

    anim_times = np.array([0.0, 0.5, 1.0, 1.5], np.float32)
    anim_rot = np.stack([
        np.array([0, 0, np.sin(a / 2), np.cos(a / 2)], np.float32)
        for a in (0.0, 0.3, 0.6, 0.9)
    ])
    anim_trans = np.array(
        [[0, 0, 0], [0, 0.1, 0], [0, 0.25, 0], [0, 0.4, 0]], np.float32
    )
    anim_scale = np.array(
        [[1, 1, 1], [1, 1.2, 1], [1, 0.9, 1], [1, 1, 1]], np.float32
    )

    # morph targets on prim0 (2 targets: POSITION+NORMAL, POSITION-only) —
    # beyond the reference, whose weights evaluation is a todo!()
    # (gltf/src/lib.rs:229)
    n_v0 = p0.shape[0]
    morph_d0 = np.zeros((n_v0, 3), np.float32)
    morph_d0[:, 0] = 0.25  # shift +x
    morph_n0 = np.zeros((n_v0, 3), np.float32)
    morph_n0[:, 0] = 0.5  # tilt normals +x
    morph_d1 = np.zeros((n_v0, 3), np.float32)
    morph_d1[:, 1] = np.linspace(0, 0.5, n_v0, dtype=np.float32)  # shear +y
    # weights animation: LINEAR 2-target weights (T·K flat scalars), plus a
    # CUBICSPLINE weights channel in the second animation (triples)
    wa_values = np.array(
        [[0.0, 0.0], [0.5, 0.25], [1.0, 0.5], [0.25, 1.0]], np.float32
    )  # [K=4, T=2] against anim_times
    cubic_w = np.stack([  # [K=3, 3(a,v,b), T=2]
        [[0.0, 0.1], [0.0, 0.0], [0.2, 0.0]],
        [[0.1, 0.0], [0.75, 0.5], [-0.1, 0.1]],
        [[0.0, 0.0], [0.25, 1.0], [0.0, 0.0]],
    ]).astype(np.float32)

    # second animation: CUBICSPLINE samplers (in-tangent, value, out-tangent
    # triples per keyframe) — beyond the reference, which comments the mode
    # out of its enum (gltf_json.rs:235-236)
    cubic_times = np.array([0.0, 0.6, 1.2], np.float32)
    cubic_trans = np.stack([  # [K, 3(a,v,b), 3]
        [[0.0, 0.1, 0], [0, 0, 0], [0.0, 0.3, 0]],
        [[0.1, -0.2, 0], [0.15, 0.05, 0], [-0.1, 0.2, 0]],
        [[0.0, 0.1, 0], [0, 0.1, 0], [0.0, 0.0, 0]],
    ]).astype(np.float32)
    rots = [np.array([0, 0, np.sin(a / 2), np.cos(a / 2)], np.float32)
            for a in (0.0, 0.5, 0.2)]
    cubic_rot = np.stack([  # [K, 3(a,v,b), 4] — tangents need no unit norm
        [[0.0, 0.0, 0.4, 0.0], rots[0], [0.0, 0.0, 0.8, -0.1]],
        [[0.1, 0.0, 0.5, 0.0], rots[1], [-0.1, 0.0, -0.5, 0.1]],
        [[0.0, 0.1, -0.3, 0.0], rots[2], [0.0, 0.0, 0.0, 0.0]],
    ]).astype(np.float32)

    return {
        "prim0": (p0, n0, uv0, t0, i0.astype(np.uint16)),
        "prim1": (p1, n1, uv1, t1, i1, joints, weights),
        "prim2": (p2, n2, uv2, t2, i2.astype(np.uint16), joints2, weights2),
        "ibms": ibms,
        "anim": (anim_times, anim_rot, anim_trans, anim_scale),
        "anim_cubic": (cubic_times, cubic_trans, cubic_rot),
        "morph": (morph_d0, morph_n0, morph_d1),
        "morph_anim": (wa_values, cubic_w),
    }


def _png_bytes() -> bytes:
    """A deterministic 8x8 RGBA PNG for the embedded-image branch."""
    import io

    from PIL import Image

    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 3] = 255
    yy, xx = np.mgrid[0:8, 0:8]
    img[..., 0] = 32 * xx
    img[..., 1] = 32 * yy
    img[..., 2] = 128
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def build() -> tuple[dict, bytes]:
    e = expected_arrays()
    p0, n0, uv0, t0, i0 = e["prim0"]
    p1, n1, uv1, t1, i1, joints, weights = e["prim1"]
    p2, n2, uv2, t2, i2, joints2, weights2 = e["prim2"]
    ibms = e["ibms"]
    anim_times, anim_rot, anim_trans, anim_scale = e["anim"]
    cubic_times, cubic_trans, cubic_rot = e["anim_cubic"]
    morph_d0, morph_n0, morph_d1 = e["morph"]
    wa_values, cubic_w = e["morph_anim"]

    blob = bytearray()
    views = []
    accessors = []

    def pad(align=4):
        while len(blob) % align:
            blob.append(0)

    def add_view(data: bytes, stride=None, extra_lead=0):
        """extra_lead: dead bytes at the view start (accessor byteOffset
        branch)."""
        pad()
        off = len(blob)
        blob.extend(b"\xcd" * extra_lead)
        blob.extend(data)
        v = {"buffer": 0, "byteOffset": off,
             "byteLength": len(data) + extra_lead}
        if stride is not None:
            v["byteStride"] = stride
        views.append(v)
        return len(views) - 1

    def add_accessor(view, ctype, atype, count, byte_offset=0,
                     with_minmax=None):
        a = {"bufferView": view, "componentType": ctype, "type": atype,
             "count": count}
        if byte_offset:
            a["byteOffset"] = byte_offset
        if with_minmax is not None:
            lo, hi = with_minmax
            a["min"] = [float(x) for x in np.atleast_1d(lo)]
            a["max"] = [float(x) for x in np.atleast_1d(hi)]
        accessors.append(a)
        return len(accessors) - 1

    # -- prim 0: ONE interleaved view, stride 48 -------------------------
    inter = np.zeros((p0.shape[0], 12), np.float32)
    inter[:, 0:3] = p0
    inter[:, 3:6] = n0
    inter[:, 6:8] = uv0
    inter[:, 8:12] = t0
    v_inter = add_view(inter.tobytes(), stride=48)
    acc_p0 = add_accessor(v_inter, FLOAT, "VEC3", p0.shape[0], 0,
                          (p0.min(0), p0.max(0)))
    acc_n0 = add_accessor(v_inter, FLOAT, "VEC3", p0.shape[0], 12)
    acc_uv0 = add_accessor(v_inter, FLOAT, "VEC2", p0.shape[0], 24)
    acc_t0 = add_accessor(v_inter, FLOAT, "VEC4", p0.shape[0], 32)
    v_i0 = add_view(i0.astype("<u2").tobytes())
    acc_i0 = add_accessor(v_i0, U16, "SCALAR", i0.shape[0])

    # -- prim 1: tight accessors + u32 indices, accessor byteOffset -------
    v_p1 = add_view(p1.astype("<f4").tobytes(), extra_lead=8)
    acc_p1 = add_accessor(v_p1, FLOAT, "VEC3", p1.shape[0], 8,
                          (p1.min(0), p1.max(0)))
    acc_n1 = add_accessor(add_view(n1.astype("<f4").tobytes()), FLOAT,
                          "VEC3", n1.shape[0])
    acc_uv1 = add_accessor(add_view(uv1.astype("<f4").tobytes()), FLOAT,
                           "VEC2", uv1.shape[0])
    acc_t1 = add_accessor(add_view(t1.astype("<f4").tobytes()), FLOAT,
                          "VEC4", t1.shape[0])
    v_i1 = add_view(i1.astype("<u4").tobytes())
    acc_i1 = add_accessor(v_i1, U32, "SCALAR", i1.shape[0])
    # joints u8 + weights f32 interleaved, stride 20
    jw = bytearray()
    for k in range(p1.shape[0]):
        jw += joints[k].tobytes() + weights[k].astype("<f4").tobytes()
    v_jw = add_view(bytes(jw), stride=20)
    acc_j1 = add_accessor(v_jw, U8, "VEC4", p1.shape[0], 0)
    acc_w1 = add_accessor(v_jw, FLOAT, "VEC4", p1.shape[0], 4)

    # -- prim 2 (skin 1): tight everything, u16 indices -------------------
    acc_p2 = add_accessor(add_view(p2.astype("<f4").tobytes()), FLOAT,
                          "VEC3", p2.shape[0], 0, (p2.min(0), p2.max(0)))
    acc_n2 = add_accessor(add_view(n2.astype("<f4").tobytes()), FLOAT,
                          "VEC3", n2.shape[0])
    acc_uv2 = add_accessor(add_view(uv2.astype("<f4").tobytes()), FLOAT,
                           "VEC2", uv2.shape[0])
    acc_t2 = add_accessor(add_view(t2.astype("<f4").tobytes()), FLOAT,
                          "VEC4", t2.shape[0])
    acc_i2 = add_accessor(add_view(i2.astype("<u2").tobytes()), U16,
                          "SCALAR", i2.shape[0])
    acc_j2 = add_accessor(add_view(joints2.tobytes()), U8, "VEC4", p2.shape[0])
    acc_w2 = add_accessor(add_view(weights2.astype("<f4").tobytes()), FLOAT,
                          "VEC4", p2.shape[0])

    # -- skins -------------------------------------------------------------
    # MAT4 stored column-major per glTF spec; the loader transposes back
    ibms_cm = np.stack([m.T for m in ibms]).astype("<f4")
    acc_ibm = add_accessor(add_view(ibms_cm.tobytes()), FLOAT, "MAT4", 3)

    # -- animation ---------------------------------------------------------
    acc_at = add_accessor(
        add_view(anim_times.astype("<f4").tobytes()), FLOAT, "SCALAR", 4,
        0, (anim_times.min(), anim_times.max()),
    )
    acc_ar = add_accessor(add_view(anim_rot.astype("<f4").tobytes()), FLOAT,
                          "VEC4", 4)
    acc_atr = add_accessor(add_view(anim_trans.astype("<f4").tobytes()),
                           FLOAT, "VEC3", 4)
    acc_asc = add_accessor(add_view(anim_scale.astype("<f4").tobytes()),
                           FLOAT, "VEC3", 4)
    # CUBICSPLINE outputs: accessor count = 3 × keyframes (triples)
    acc_ct = add_accessor(
        add_view(cubic_times.astype("<f4").tobytes()), FLOAT, "SCALAR", 3,
        0, (cubic_times.min(), cubic_times.max()),
    )
    acc_ctr = add_accessor(add_view(cubic_trans.astype("<f4").tobytes()),
                           FLOAT, "VEC3", 9)
    acc_crot = add_accessor(add_view(cubic_rot.astype("<f4").tobytes()),
                            FLOAT, "VEC4", 9)
    # morph deltas + weights animations
    acc_md0 = add_accessor(add_view(morph_d0.astype("<f4").tobytes()),
                           FLOAT, "VEC3", morph_d0.shape[0])
    acc_mn0 = add_accessor(add_view(morph_n0.astype("<f4").tobytes()),
                           FLOAT, "VEC3", morph_n0.shape[0])
    # morph_d1 ships SPARSE (bufferView-less zero base + u16 indices into
    # the nonzero rows) — the common export form for blend-shape deltas
    sp_rows = np.nonzero(np.any(morph_d1 != 0.0, axis=1))[0].astype(np.uint16)
    v_spi = add_view(sp_rows.astype("<u2").tobytes())
    v_spv = add_view(morph_d1[sp_rows].astype("<f4").tobytes())
    accessors.append({
        "componentType": FLOAT, "type": "VEC3",
        "count": morph_d1.shape[0],
        "sparse": {
            "count": int(sp_rows.size),
            "indices": {"bufferView": v_spi, "componentType": U16},
            "values": {"bufferView": v_spv},
        },
    })
    acc_md1 = len(accessors) - 1
    acc_wa = add_accessor(add_view(wa_values.astype("<f4").tobytes()),
                          FLOAT, "SCALAR", wa_values.size)
    acc_cw = add_accessor(add_view(cubic_w.astype("<f4").tobytes()),
                          FLOAT, "SCALAR", cubic_w.size)

    # -- embedded PNG ------------------------------------------------------
    png = _png_bytes()
    v_png = add_view(png)

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            # 0 root → static mesh node + two skinned nodes + bone chains
            {"name": "root", "children": [1, 2, 3, 4, 7],
             "translation": [0, 0, 0]},
            {"name": "static", "mesh": 0, "weights": [0.5, 0.25],
             "matrix": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0.5, 0, 0, 1]},
            {"name": "skinned-a", "mesh": 1, "skin": 0},
            {"name": "skinned-b", "mesh": 2, "skin": 1},
            {"name": "boneA0", "children": [5], "translation": [0, 0.5, 0]},
            {"name": "boneA1", "children": [6], "translation": [0, 0.5, 0],
             "rotation": [0, 0, 0.247404, 0.968912]},
            {"name": "boneA2", "translation": [0, 0.5, 0]},
            {"name": "boneB0", "children": [8], "scale": [1, 1.5, 1]},
            {"name": "boneB1", "translation": [0.2, 0, 0]},
        ],
        "meshes": [
            {"primitives": [{
                "attributes": {"POSITION": acc_p0, "NORMAL": acc_n0,
                               "TEXCOORD_0": acc_uv0, "TANGENT": acc_t0},
                "indices": acc_i0, "material": 0,
                "targets": [
                    {"POSITION": acc_md0, "NORMAL": acc_mn0},
                    {"POSITION": acc_md1},
                ],
            }],
             "weights": [0.25, 0.0]},
            {"primitives": [{
                "attributes": {"POSITION": acc_p1, "NORMAL": acc_n1,
                               "TEXCOORD_0": acc_uv1, "TANGENT": acc_t1,
                               "JOINTS_0": acc_j1, "WEIGHTS_0": acc_w1},
                "indices": acc_i1, "material": 1,
            }]},
            {"primitives": [{
                "attributes": {"POSITION": acc_p2, "NORMAL": acc_n2,
                               "TEXCOORD_0": acc_uv2, "TANGENT": acc_t2,
                               "JOINTS_0": acc_j2, "WEIGHTS_0": acc_w2},
                "indices": acc_i2, "material": 2,
            }]},
        ],
        "skins": [
            {"joints": [4, 5, 6], "inverseBindMatrices": acc_ibm},
            {"joints": [7, 8]},  # identity-IBM branch
        ],
        "animations": [{
            "name": "wiggle",
            "samplers": [
                {"input": acc_at, "output": acc_ar,
                 "interpolation": "LINEAR"},
                {"input": acc_at, "output": acc_atr,
                 "interpolation": "STEP"},
                {"input": acc_at, "output": acc_asc,
                 "interpolation": "LINEAR"},
                {"input": acc_at, "output": acc_wa,
                 "interpolation": "LINEAR"},
            ],
            "channels": [
                {"sampler": 0, "target": {"node": 5, "path": "rotation"}},
                {"sampler": 1, "target": {"node": 6, "path": "translation"}},
                {"sampler": 2, "target": {"node": 8, "path": "scale"}},
                {"sampler": 3, "target": {"node": 1, "path": "weights"}},
            ],
        }, {
            "name": "bounce",
            "samplers": [
                {"input": acc_ct, "output": acc_ctr,
                 "interpolation": "CUBICSPLINE"},
                {"input": acc_ct, "output": acc_crot,
                 "interpolation": "CUBICSPLINE"},
                {"input": acc_ct, "output": acc_cw,
                 "interpolation": "CUBICSPLINE"},
            ],
            "channels": [
                {"sampler": 0, "target": {"node": 7, "path": "translation"}},
                {"sampler": 1, "target": {"node": 4, "path": "rotation"}},
                {"sampler": 2, "target": {"node": 1, "path": "weights"}},
            ],
        }],
        "images": [{"bufferView": v_png, "mimeType": "image/png",
                    "name": "embedded-checker"}],
        "textures": [{"source": 0}],
        "materials": [
            {"name": "textured",
             "pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}},
            {"name": "pink", "pbrMetallicRoughness": {
                "baseColorFactor": [0.9, 0.5, 0.6, 1.0]}},
            {"name": "masked", "alphaMode": "MASK", "alphaCutoff": 0.35,
             "pbrMetallicRoughness": {
                 "baseColorFactor": [0.4, 0.8, 0.9, 0.8]}},
        ],
        "bufferViews": views,
        "accessors": accessors,
        "buffers": [{"uri": "strided.bin", "byteLength": len(blob)}],
    }
    return gltf, bytes(blob)


def write() -> None:
    FIXTURE_DIR.mkdir(exist_ok=True)
    gltf, blob = build()
    GLTF_PATH.write_text(json.dumps(gltf, indent=1, sort_keys=True))
    BIN_PATH.write_bytes(blob)
    print(f"wrote {GLTF_PATH} ({GLTF_PATH.stat().st_size} B) + "
          f"{BIN_PATH} ({len(blob)} B)")


if __name__ == "__main__":
    write()
