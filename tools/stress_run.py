import time
import numpy as np
import renderer_tpu as rt
from renderer_tpu.assets import proxy as proxy_mod
from renderer_tpu.core import math3d

reg = rt.MaterialRegistry()
b = rt.VertexLibraryBuilder()
meshes, mat = proxy_mod.make_stress_field(b, reg, n_meshes=32, tris_per_mesh=32768)
b.build()
r = rt.Renderer(reg, rt.RenderConfig(width=1920, height=1080,
                max_triangles=1 << 21, pair_capacity=1 << 20),
                overflow_policy="off")
scene = rt.Scene(world_space=rt.GLTF)
eye = np.array([0.0, 14.0, 26.0], np.float32)
pos, orient = math3d.look_at(eye, np.array([0.,0.,0.],np.float32), np.array([0,1,0],np.float32))
scene.camera.position, scene.camera.orientation = pos, orient
for m in meshes: scene.queue_mesh(m, mat, None, math3d.IDENTITY)
img = r.render_frame_device(scene, 0)
img.block_until_ready()
t0 = time.perf_counter()
for _ in range(20): img = r.render_frame_device(scene, 0)
img.block_until_ready()
ms = (time.perf_counter()-t0)/20*1e3
print(f"stress-1M-tris-1080p: {ms:.3f} ms/frame = {1000/ms:.1f} fps", flush=True)
import threading
done = {}
th = threading.Thread(target=lambda: done.update(s=np.asarray(r.last_stats)), daemon=True)
th.start(); th.join(150)
print("stats:", done.get("s"), flush=True)
import os
from PIL import Image
th2 = threading.Thread(target=lambda: done.update(img=np.asarray(img)), daemon=True)
th2.start(); th2.join(150)
if "img" in done: Image.fromarray(done["img"]).save("/tmp/stress_1m.png")
os._exit(0)
