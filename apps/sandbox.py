"""Sandbox demo — parity with the reference's full demo app
(reference: examples/sandbox/src/main.rs): Sponza at the origin plus the
animated Smol Ame model (scale 0.7, rotated -π/2 about Y, at (3, 0, -0.5)),
GLTF world space, camera starting at (0, 1.6, 0) with yaw 1.56.

Assets are read from the reference checkout (read-only) or
$RENDERER_TPU_ASSETS. Run: python -m apps.sandbox [out.png] [debug_mode] [time]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

import renderer_tpu as rt
from renderer_tpu.assets.gltf_loader import Gltf, load_gltf
from renderer_tpu.core import math3d

ASSET_ROOT = Path(
    os.environ.get("RENDERER_TPU_ASSETS", "/root/reference/examples/sandbox/src")
)
SPONZA = ASSET_ROOT / "sponza/glTF/Sponza.gltf"
SMOL_AME = ASSET_ROOT / "smol-ame-by-seafoam/smol-ame.gltf"


class Sandbox:
    """Loads real assets when the .bin geometry buffers exist; otherwise
    reconstructs the workload via assets/proxy.py (the reference checkout
    ships the glTF JSON + all .ntex textures but not the LFS .bin buffers)."""

    def __init__(self, with_smol_ame: bool = True):
        self.registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        self.proxy_geometry = not (SPONZA.parent / "Sponza.bin").exists()
        if self.proxy_geometry:
            from renderer_tpu.assets import proxy

            print("# sponza .bin buffers missing; using proxy geometry with "
                  "real materials/textures", file=sys.stderr)
            self.sponza = proxy.load_gltf_proxy(SPONZA, builder, self.registry)
            if with_smol_ame:
                from renderer_tpu.assets import ntex as ntex_mod
                from renderer_tpu.materials.registry import Texture, TextureKind

                _, mips = ntex_mod.decode(
                    (SMOL_AME.parent / "terrariumtexsketchfab.ntex").read_bytes()
                )
                tex = Texture(mips, TextureKind.SRGB_COLOR, "terrariumtexsketchfab")
                self.smol_ame = proxy.make_skinned_character(
                    builder, self.registry, textures=[tex]
                )
            else:
                self.smol_ame = None
        else:
            self.sponza = load_gltf(SPONZA, builder, self.registry)
            self.smol_ame = (
                load_gltf(SMOL_AME, builder, self.registry) if with_smol_ame else None
            )
        self.library = builder.build()

    def build_scene(self, game_time: float = 0.0) -> rt.Scene:
        """main.rs:549-583: camera pose, Sponza at identity, Smol Ame with
        all animations playing at game_time % end_time."""
        scene = rt.Scene(world_space=rt.GLTF)
        scene.camera.position = np.array([0.0, 1.6, 0.0], np.float32)
        yaw, pitch = 1.56, 0.0
        scene.camera.orientation = math3d.quat_mul(
            math3d.quat_from_axis_angle([0, 1, 0], yaw),
            math3d.quat_from_axis_angle([1, 0, 0], pitch),
        )
        self.sponza.queue(scene, math3d.IDENTITY)
        if self.smol_ame is not None:
            playing = [
                (game_time % a.end_time, a) for a in self.smol_ame.animations
            ]
            transform = math3d.trs(
                translation=np.array([3.0, 0.0, -0.5], np.float32),
                rotation=math3d.quat_from_axis_angle([0, 1, 0], -np.pi / 2),
                scale=np.array([0.7, 0.7, 0.7], np.float32),
            )
            self.smol_ame.queue_animated(scene, transform, playing)
        return scene


def build_bench():
    """Bench entry (bench.py): full sandbox scene at 1920×1080 with the
    reference's 4×MSAA (main.rs:114-117)."""
    sandbox = Sandbox()
    config = rt.RenderConfig(width=1920, height=1080, msaa_samples=4)
    renderer = rt.Renderer(sandbox.registry, config)
    scene = sandbox.build_scene(1.0)
    return "sponza+ame-1080p-msaa4", renderer, scene


def main(out_path: str = "sandbox.png", debug_mode: int = 0, game_time: float = 1.0):
    sandbox = Sandbox()
    config = rt.RenderConfig(width=1280, height=720)
    renderer = rt.Renderer(sandbox.registry, config)
    scene = sandbox.build_scene(float(game_time))
    img = renderer.render_frame(scene, debug_mode=int(debug_mode))
    from PIL import Image

    Image.fromarray(img).save(out_path)
    print(f"wrote {out_path} ({img.shape[1]}x{img.shape[0]}), "
          f"{len(scene.draws)} draws")
    return img


if __name__ == "__main__":
    main(*sys.argv[1:])
