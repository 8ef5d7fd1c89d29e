"""Scene: the per-frame draw queue.

Parity: renderer/src/renderer/scene.rs:51-107. `queue_mesh` caps the queue at
MAX_DRAW_CALLS and returns False when full; skinned meshes must come with a
joints offset and vice versa (scene.rs:78-92). `allocate_joint_offset`
bump-allocates mat4 ranges out of the shared joint palette (≤1024 joints,
scene.rs:96-107).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from renderer_tpu.core import camera as camera_mod
from renderer_tpu.core import constants
from renderer_tpu.geometry.vertex_library import Mesh
from renderer_tpu.materials.registry import AlphaMode, Material


def pipeline_index(material: Material, skinned: bool) -> int:
    """Material::pipeline parity (descriptors/material.rs:150-163); the enum
    order (pipeline_parameters.rs:33-50) makes blended pipelines sort last."""
    base = {
        AlphaMode.OPAQUE: 0,
        AlphaMode.ALPHA_TO_COVERAGE: 2,
        AlphaMode.BLENDED: 4,
    }[material.alpha_mode]
    return base + (1 if skinned else 0)


@dataclass
class DrawParameters:
    mesh: Mesh
    material: Material
    transform: np.ndarray  # 4x4 model matrix
    joints_offset: int | None

    def sort_key(self):
        """DrawParameters/DrawCallTag ordering (scene.rs:35-41,
        scene/draw_call_tag.rs:23-31): (joints, pipeline, library, mesh,
        material). Rust's Option Ord puts None (static draws) first."""
        joints = (0, 0) if self.joints_offset is None else (1, self.joints_offset)
        return (
            joints,
            pipeline_index(self.material, self.mesh.skinned),
            self.mesh.library.library_id,
            self.mesh.mesh_id,
            self.material.id,
        )

    def merge_key(self):
        """Draws with equal (tag, joints) merge into one instanced command
        (renderer.rs:236-254); the command index is the shader's draw id."""
        return (
            pipeline_index(self.material, self.mesh.skinned),
            self.mesh.library.library_id,
            self.mesh.mesh_id,
            self.material.id,
            self.joints_offset,
        )


class Scene:
    def __init__(self, world_space: camera_mod.CoordinateSystem = camera_mod.VULKAN):
        self.world_space = world_space
        self.camera = camera_mod.Camera()
        self.draws: list[DrawParameters] = []
        self.joint_palette = np.zeros((constants.MAX_JOINT_COUNT, 4, 4), np.float32)
        self._joint_cursor = 0

    def clear(self) -> None:
        self.draws.clear()
        self._joint_cursor = 0

    def queue_mesh(
        self,
        mesh: Mesh,
        material: Material,
        joints_offset: int | None,
        transform: np.ndarray,
    ) -> bool:
        if len(self.draws) >= constants.MAX_DRAW_CALLS:
            return False
        assert mesh.skinned == (joints_offset is not None), (
            "skinned meshes must have joints defined"
        )
        self.draws.append(
            DrawParameters(mesh, material, np.asarray(transform, np.float32), joints_offset)
        )
        return True

    def allocate_joint_offset(self, count: int) -> tuple[int, np.ndarray] | None:
        """Returns (offset, [count,4,4] view to write joint matrices into),
        or None if the palette is full (scene.rs:96-107)."""
        offset = self._joint_cursor
        if offset + count > constants.MAX_JOINT_COUNT:
            return None
        self._joint_cursor = offset + count
        return offset, self.joint_palette[offset : offset + count]
