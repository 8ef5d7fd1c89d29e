"""Measure the device-resident flythrough mode (configs.py entry 6) alone."""
import time

import numpy as np

import renderer_tpu as rt
from apps.sandbox import Sandbox, orbit_camera
from renderer_tpu.core import math3d

full = Sandbox(with_smol_ame=True)
renderer = rt.Renderer(
    full.registry, rt.RenderConfig(width=1920, height=1080, msaa_samples=4,
                                   pair_capacity=1 << 20),
    overflow_policy="off",
)
k = 16
times = [1.0 + i / 30.0 for i in range(k)]
scenes = [full.build_scene(t) for t in times]
for t, s in zip(times, scenes):
    s.camera.position, s.camera.orientation = orbit_camera(0.25 * t)
imgs, _ = renderer.render_frames_device(scenes, 0)
imgs.block_until_ready()
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(4):
        imgs, _ = renderer.render_frames_device(scenes, 0)
    imgs.block_until_ready()
    best = max(best, 4 * k / (time.perf_counter() - t0))
print(f"flythrough-batch{k}-1080p-msaa4: {best:.1f} fps "
      f"({1000.0 / best:.3f} ms/frame)", flush=True)
import os

os._exit(0)
