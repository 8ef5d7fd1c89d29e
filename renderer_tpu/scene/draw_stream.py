"""Draw-stream building: sorted draws → fixed-shape device arrays.

This is the TPU analog of the reference's per-frame render_frame prologue:
sort draws, merge consecutive identical (tag, joints) into instanced indirect
commands, build the interleaved transform stream
(reference: renderer/src/renderer.rs:215-256). Here the "indirect command
stream" becomes two things:

- GeometryStream (cached per draw-list *shape*): expanded vertex / triangle
  index arrays. Expansion assigns every (draw, vertex) pair a slot so that
  instanced draws of the same mesh get distinct transformed vertices —
  the TPU analog of per-instance vertex attributes.
- frame arrays (rebuilt every frame, ~µs of numpy): per-draw transforms,
  normal matrices, material ids, joints offsets, debug ids, joint palette.

Static shapes: capacities are power-of-two buckets so the jitted frame
function only recompiles when a scene outgrows its bucket.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from renderer_tpu.core import constants, math3d
from renderer_tpu.materials.registry import AlphaMode
from renderer_tpu.scene.scene import DrawParameters, Scene


def _next_pow2(x: int) -> int:
    return 1 << max(4, (int(x) - 1).bit_length())


def sorted_draws(scene: Scene) -> list[DrawParameters]:
    return sorted(scene.draws, key=lambda d: d.sort_key())


def geometry_key(draws: list[DrawParameters]) -> tuple:
    """Geometry arrays depend only on this; frames that queue the same meshes
    in the same order (the common case) reuse the cached device arrays."""
    return tuple(
        (d.mesh.library.library_id, d.mesh.mesh_id, d.mesh.skinned,
         d.material.alpha_mode)
        for d in draws
    )


@dataclass
class GeometryStream:
    """Host-side packed geometry for one draw list (numpy; device_put by the
    engine). Vertex attribute arrays are the concatenation of every library
    used, in first-use order."""

    # concatenated library attributes [V, *]
    positions: np.ndarray
    uvs: np.ndarray
    normals: np.ndarray
    tangents: np.ndarray
    joints: np.ndarray
    weights: np.ndarray
    # expanded (draw, vertex) stream [VE]
    exp_src: np.ndarray  # i32 → index into concatenated attributes
    exp_draw: np.ndarray  # i32 → draw slot
    # triangle stream [Tc, 3] of expanded vertex ids, segmented by alpha
    # class: [opaque | masked (alpha-to-coverage) | blended], each segment in
    # draw order (the reference's pipeline iteration order,
    # renderer.rs:433-441)
    tri_v: np.ndarray
    num_tris: int
    num_opaque_tris: int
    num_masked_tris: int
    skin_start: int  # expanded-vertex index where skinned draws begin
    num_expanded: int


def build_geometry(draws: list[DrawParameters], max_triangles: int) -> GeometryStream:
    lib_base: dict[int, int] = {}
    libs = []
    cursor = 0
    for d in draws:
        lib = d.mesh.library
        if lib.library_id not in lib_base:
            lib_base[lib.library_id] = cursor
            libs.append(lib)
            cursor += lib.vertex_count

    if libs:
        positions = np.concatenate([l.positions for l in libs], axis=0)
        uvs = np.concatenate([l.uvs for l in libs], axis=0)
        normals = np.concatenate([l.normals for l in libs], axis=0)
        tangents = np.concatenate([l.tangents for l in libs], axis=0)
        joints = np.concatenate([l.joints for l in libs], axis=0)
        weights = np.concatenate([l.weights for l in libs], axis=0)
    else:
        positions = np.zeros((1, 3), np.float32)
        uvs = np.zeros((1, 2), np.float32)
        normals = np.zeros((1, 3), np.float32)
        tangents = np.zeros((1, 4), np.float32)
        joints = np.zeros((1, 4), np.int32)
        weights = np.zeros((1, 4), np.float32)

    exp_src_parts: list[np.ndarray] = []
    exp_draw_parts: list[np.ndarray] = []
    class_tris: dict[int, list[np.ndarray]] = {
        AlphaMode.OPAQUE: [], AlphaMode.ALPHA_TO_COVERAGE: [], AlphaMode.BLENDED: []
    }
    skin_start = None
    cursor = 0
    for slot, d in enumerate(draws):
        mesh = d.mesh
        base = lib_base[mesh.library.library_id] + mesh.vertex_offset
        n = mesh.vertex_count
        if mesh.skinned and skin_start is None:
            skin_start = cursor
        exp_src_parts.append(np.arange(base, base + n, dtype=np.int32))
        exp_draw_parts.append(np.full(n, slot, np.int32))
        local = mesh.library.indices[
            mesh.first_index : mesh.first_index + mesh.index_count
        ].astype(np.int32)
        class_tris[d.material.alpha_mode].append((local + cursor).reshape(-1, 3))
        cursor += n

    num_expanded = cursor
    if skin_start is None:
        skin_start = num_expanded

    ve_cap = _next_pow2(max(num_expanded, 1))
    exp_src = np.zeros(ve_cap, np.int32)
    exp_draw = np.zeros(ve_cap, np.int32)
    if exp_src_parts:
        exp_src[:num_expanded] = np.concatenate(exp_src_parts)
        exp_draw[:num_expanded] = np.concatenate(exp_draw_parts)

    def cat(lst):
        return np.concatenate(lst, axis=0) if lst else np.zeros((0, 3), np.int32)

    opaque = cat(class_tris[AlphaMode.OPAQUE])
    masked = cat(class_tris[AlphaMode.ALPHA_TO_COVERAGE])
    blended = cat(class_tris[AlphaMode.BLENDED])
    num_opaque = opaque.shape[0]
    num_masked = masked.shape[0]
    num_tris = num_opaque + num_masked + blended.shape[0]
    assert num_tris <= max_triangles, (
        f"scene has {num_tris} triangles, config.max_triangles={max_triangles}"
    )
    # Capacity must cover whole raster DMA chunks (raster_kernel.CHUNK).
    t_cap = min(max(_next_pow2(max(num_tris, 1)), 256), _next_pow2(max_triangles))
    tri_v = np.zeros((t_cap, 3), np.int32)
    tri_v[:num_tris] = np.concatenate([opaque, masked, blended], axis=0)

    return GeometryStream(
        positions=positions,
        uvs=uvs,
        normals=normals,
        tangents=tangents,
        joints=joints,
        weights=weights,
        exp_src=exp_src,
        exp_draw=exp_draw,
        tri_v=tri_v,
        num_tris=num_tris,
        num_opaque_tris=num_opaque,
        num_masked_tris=num_masked,
        skin_start=int(skin_start),
        num_expanded=num_expanded,
    )


def build_frame_arrays(scene: Scene, draws: list[DrawParameters]) -> dict[str, np.ndarray]:
    """Per-frame numpy arrays (transforms, materials, joints). Mirrors
    renderer.rs:219-256: one transform slot per queued draw; the debug draw id
    is the merged command's first instance index."""
    n = len(draws)
    cap = _next_pow2(max(n, 1))
    transforms = np.zeros((cap, 3, 4), np.float32)
    normal_mats = np.zeros((cap, 3, 3), np.float32)
    material_id = np.zeros(cap, np.int32)
    joints_offset = np.zeros(cap, np.int32)
    skinned = np.zeros(cap, np.int32)
    debug_id = np.zeros(cap, np.int32)

    if n:
        m = np.stack([d.transform for d in draws])  # [D,4,4] f32
        transforms[:n] = m[:, :3, :4]
        # inverse-transpose via the closed-form cofactor rows
        # (inv(A)ᵀ row i = cross(row_{i+1}, row_{i+2}) / det) — vectorized,
        # no LAPACK dispatch in the frame loop
        r0, r1, r2 = m[:, 0, :3], m[:, 1, :3], m[:, 2, :3]
        c0 = np.cross(r1, r2)
        det = np.einsum("di,di->d", r0, c0)
        inv_det = (1.0 / np.where(np.abs(det) > 1e-30, det, 1.0))[:, None]
        normal_mats[:n, 0] = c0 * inv_det
        normal_mats[:n, 1] = np.cross(r2, r0) * inv_det
        normal_mats[:n, 2] = np.cross(r0, r1) * inv_det

    prev_merge_key = None
    group_first = 0
    for i, d in enumerate(draws):
        material_id[i] = d.material.id
        if d.joints_offset is not None:
            joints_offset[i] = d.joints_offset
            skinned[i] = 1
        key = d.merge_key()
        if key != prev_merge_key:
            group_first = i
            prev_merge_key = key
        debug_id[i] = group_first

    return {
        "transforms": transforms,
        "normal_mats": normal_mats,
        "material_id": material_id,
        "joints_offset": joints_offset,
        "skinned": skinned,
        "debug_id": debug_id,
        "joint_palette": scene.joint_palette[:, :3, :],  # [J, 3, 4]
    }


def pack_frame_arrays(arrays: dict, proj_view: np.ndarray,
                      counts: tuple[int, int, int, int]) -> dict:
    """Pack the per-frame host arrays into few device uploads (each upload
    has ~0.1 ms fixed dispatch cost; the reference's analog is writing all
    temp uniforms into ONE per-frame arena buffer, renderer.rs:258-302):
      pdf    f32 [Dc, 21]  : transforms (12) ++ normal matrices (9)
      pdi    i32 [Dc, 4]   : material_id, joints_offset, skinned, debug_id
      palette f32 [J, 3, 4]
      proj_view f32 [4, 4]
      counts i32 [4]       : num_tris, n_opaque, n_masked, debug_mode
    """
    cap = arrays["transforms"].shape[0]
    pdf = np.concatenate(
        [arrays["transforms"].reshape(cap, 12),
         arrays["normal_mats"].reshape(cap, 9)], axis=1,
    )
    pdi = np.stack(
        [arrays["material_id"], arrays["joints_offset"],
         arrays["skinned"], arrays["debug_id"]], axis=1,
    ).astype(np.int32)
    return {
        "pdf": pdf,
        "pdi": pdi,
        "joint_palette": arrays["joint_palette"],
        "proj_view": np.asarray(proj_view, np.float32),
        "counts": np.asarray(counts, np.int32),
    }


def unpack_frame(packed: dict) -> dict:
    """Inverse of pack_frame_arrays on device values (slices are free under
    jit). Accepts already-unpacked dicts unchanged."""
    if "pdf" not in packed:
        return packed
    pdf = packed["pdf"]
    pdi = packed["pdi"]
    cap = pdf.shape[0]
    counts = packed["counts"]
    return {
        "transforms": pdf[:, :12].reshape(cap, 3, 4),
        "normal_mats": pdf[:, 12:21].reshape(cap, 3, 3),
        "material_id": pdi[:, 0],
        "joints_offset": pdi[:, 1],
        "skinned": pdi[:, 2],
        "debug_id": pdi[:, 3],
        "joint_palette": packed["joint_palette"],
        "proj_view": packed["proj_view"],
        "num_tris": counts[0],
        "n_opaque": counts[1],
        "n_masked": counts[2],
        "debug_mode": counts[3],
    }
