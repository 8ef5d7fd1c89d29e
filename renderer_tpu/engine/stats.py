"""Observability: HBM memory accounting and per-stage device timings.

Parity targets:
- VRAM atomics + startup logging (reference: renderer/src/lib.rs:75-93,
  examples/sandbox/src/main.rs:119-127 print_memory_usage,
  physical_device.rs:109-119 memory-budget query) → `memory_usage()` /
  `log_memory_usage()` over `device.memory_stats()`.
- The `Bytes` pretty-printer (lib.rs:103-128).
- Per-stage µs timings (the profile-with-tracing span tree,
  main.rs:704-847) → `device_stage_timings()` executes the frame stage by
  stage with explicit jitted boundaries and returns a table.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp


def format_bytes(n: int) -> str:
    """Bytes pretty-printer (lib.rs:103-128 prints the largest binary unit)."""
    value = float(n)
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if value < 1024.0 or unit == "TiB":
            return f"{value:.2f} {unit}" if unit != "B" else f"{int(value)} B"
        value /= 1024.0
    return f"{value:.2f} TiB"


def memory_usage(device=None) -> dict:
    """HBM usage for one device (the VK_EXT_memory_budget analog)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    return {
        "in_use": stats.get("bytes_in_use", 0),
        "peak": stats.get("peak_bytes_in_use", 0),
        "limit": stats.get("bytes_limit", 0),
    }


def log_memory_usage(tag: str, device=None) -> str:
    u = memory_usage(device)
    line = (
        f"[{tag}] HBM in use: {format_bytes(u['in_use'])}, "
        f"peak: {format_bytes(u['peak'])}, limit: {format_bytes(u['limit'])}"
    )
    print(line)
    return line


def _time_call(fn, *args, iters: int = 10) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def device_stage_timings(renderer, scene, iters: int = 10) -> dict[str, float]:
    """Executes the frame pipeline stage by stage (each stage its own jit,
    all data passed explicitly — nothing captured as constants) and returns
    {stage: ms}. The sum exceeds the fused frame time (the production path is
    one jit); this mirrors the reference's per-scope µs readout."""
    from renderer_tpu.raster import binning, raster_kernel, setup, shade, post, vertex_stage
    from renderer_tpu.raster.pipeline import interpret_mode
    from renderer_tpu.scene import draw_stream

    cfg = renderer.config
    interp = interpret_mode()
    draws = draw_stream.sorted_draws(scene)
    gs, geom = renderer._geometry(draws)
    frame = draw_stream.unpack_frame(renderer._frame_arrays(scene, draws, gs))
    mats = renderer._materials()

    timings: dict[str, float] = {}

    vs_fn = jax.jit(
        functools.partial(vertex_stage.run_vertex_stage, skin_start=gs.skin_start)
    )
    timings["vertex+skinning"] = _time_call(vs_fn, geom, frame, iters=iters)
    vs = vs_fn(geom, frame)

    setup_fn = jax.jit(
        functools.partial(setup.triangle_setup, width=cfg.width, height=cfg.height)
    )
    timings["triangle setup"] = _time_call(
        setup_fn, vs["clip"], geom["tri_v"], frame["num_tris"], iters=iters
    )
    td = setup_fn(vs["clip"], geom["tri_v"], frame["num_tris"])

    bin_fn = functools.partial(
        binning.bin_triangles,
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h, pair_capacity=cfg.pair_capacity,
    )
    timings["binning"] = _time_call(bin_fn, td, 0, frame["n_opaque"], iters=iters)
    b, s, c, _ = bin_fn(td, 0, frame["n_opaque"])

    raster_fn = functools.partial(
        raster_kernel.rasterize_binned,
        padded_height=cfg.padded_height, padded_width=cfg.padded_width,
        tile_h=cfg.tile_h, tile_w=cfg.tile_w, sub=cfg.tri_chunk, interpret=interp,
    )
    timings["raster (opaque)"] = _time_call(raster_fn, b, s, c, iters=iters)
    depth, trid = raster_fn(b, s, c)

    def shade_fn(trid_, geom_, vs_, frame_, mats_):
        hdr = shade.shade(
            trid_[: cfg.height, : cfg.width], geom_, vs_, frame_, mats_,
            width=cfg.width, height=cfg.height,
        )
        return post.tonemap(hdr[..., :3])

    shade_jit = jax.jit(shade_fn)
    timings["deferred shade + tonemap"] = _time_call(
        shade_jit, trid, geom, vs, frame, mats, iters=iters
    )
    return timings
