"""Renderer: the frame engine gluing scene → device arrays → jitted frame.

This is the TPU analog of the reference's Renderer frame loop
(renderer/src/renderer.rs:130-356): `render_frame(scene)` sorts the draws,
builds the per-frame arrays (~µs of numpy, matching the reference's ~20 µs
queue cost), uploads them, and dispatches one jitted device step. Geometry
and material arrays are cached: a frame that queues the same meshes reuses
device-resident geometry (the analog of the static vertex library staying in
VRAM), so steady-state host→device traffic is just transforms + camera +
joints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from renderer_tpu.core import constants
from renderer_tpu.core.config import RenderConfig
from renderer_tpu.engine.profiling import Profiler
from renderer_tpu.materials.atlas import build_atlas
from renderer_tpu.materials.registry import MaterialRegistry
from renderer_tpu.raster import pipeline
from renderer_tpu.scene import draw_stream
from renderer_tpu.scene.scene import Scene


def _enable_compilation_cache() -> None:
    """Persistent compile cache — the VkPipelineCache analog (the reference
    threads a pipeline cache through every recreation so resizes reuse
    compiled pipelines, pipelines.rs:164-174). Makes first frames after the
    first process start near-instant."""
    if getattr(_enable_compilation_cache, "_done", False):
        return
    _enable_compilation_cache._done = True
    try:
        import pathlib

        cache_dir = pathlib.Path(__file__).resolve().parents[2] / ".cache" / "jax"
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only


class Renderer:
    def __init__(
        self,
        registry: MaterialRegistry,
        config: RenderConfig | None = None,
        profiler: Profiler | None = None,
    ) -> None:
        _enable_compilation_cache()
        self.config = (config or RenderConfig()).validate()
        self.registry = registry
        self.profiler = profiler or Profiler(enabled=False)
        self._geom_cache: dict = {}
        self._mat_cache: tuple[int, dict] | None = None
        self._interpret = pipeline.interpret_mode()
        self._frame_fn = jax.jit(
            functools.partial(pipeline.render_frame, interpret=self._interpret),
            static_argnames=("config", "skin_start", "has_masked", "has_blended"),
        )

    # -- device array preparation -------------------------------------------

    def _geometry(self, draws):
        key = draw_stream.geometry_key(draws)
        cached = self._geom_cache.get(key)
        if cached is None:
            gs = draw_stream.build_geometry(draws, self.config.max_triangles)
            dev = {
                k: jnp.asarray(getattr(gs, k))
                for k in ("positions", "uvs", "normals", "tangents", "joints",
                          "weights", "exp_src", "exp_draw", "tri_v")
            }
            cached = (gs, dev)
            self._geom_cache[key] = cached
        return cached

    def _materials(self):
        reg = self.registry
        if self._mat_cache is not None and self._mat_cache[0] == reg.version:
            return self._mat_cache[1]
        at = build_atlas(reg)
        dev = {
            "base_color_factor": jnp.asarray(reg.base_color_factor),
            "emissive_occlusion": jnp.asarray(reg.emissive_occlusion),
            "alpha_rgh_mtl_normal": jnp.asarray(reg.alpha_rgh_mtl_normal),
            "tex_indices": jnp.asarray(reg.tex_indices),
            "atlas": jnp.asarray(at.data),
            "atlas_table": jnp.asarray(at.table),
            "atlas_srgb": jnp.asarray(at.srgb),
        }
        self._mat_cache = (reg.version, dev)
        return dev

    def _frame_arrays(self, scene: Scene, draws, gs, debug_mode: int = 0) -> dict:
        arrays = draw_stream.build_frame_arrays(scene, draws)
        proj, view = scene.camera.proj_view(
            float(self.config.width), float(self.config.height), scene.world_space
        )
        packed = draw_stream.pack_frame_arrays(
            arrays, proj @ view,
            (gs.num_tris, gs.num_opaque_tris, gs.num_masked_tris, debug_mode),
        )
        return {k: jnp.asarray(v) for k, v in packed.items()}

    # -- frame loop ----------------------------------------------------------

    def render_frame_device(self, scene: Scene, debug_mode: int = 0) -> jnp.ndarray:
        """One frame, returned as a device u8 [H,W,3] array (no host copy)."""
        p = self.profiler
        with p.span("render_frame"):
            with p.span("sort draws"):
                draws = draw_stream.sorted_draws(scene)
            with p.span("geometry arrays"):
                gs, geom_dev = self._geometry(draws)
            with p.span("frame arrays"):
                frame = self._frame_arrays(scene, draws, gs, debug_mode)
            with p.span("materials"):
                mats = self._materials()
            with p.span("dispatch jitted frame"):
                img = self._frame_fn(
                    geom_dev, frame, mats,
                    config=self.config, skin_start=gs.skin_start,
                    has_masked=gs.num_masked_tris > 0,
                    has_blended=gs.num_tris > gs.num_opaque_tris + gs.num_masked_tris,
                )
        return img

    def render_frame(self, scene: Scene, debug_mode: int = 0) -> np.ndarray:
        """One frame, copied back to the host (the 'present' boundary).

        Benchmark note: keep hot loops on `render_frame_device` and read back
        once at the end — under tunneled TPU runtimes (axon) the first host
        readback permanently slows every subsequent dispatch."""
        img = self.render_frame_device(scene, debug_mode)
        with self.profiler.span("present (device→host)"):
            return np.asarray(img)
