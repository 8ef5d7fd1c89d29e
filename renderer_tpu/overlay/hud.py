"""Performance HUD overlay — the reference's in-app ImGui stats window.

The reference renders a live collapsible span tree with µs timings and
%-of-frame coloring through an ImGui pass (reference:
renderer/src/imgui_support.rs:107-169, examples/sandbox/src/main.rs:769-847).
On TPU the frame is already a host-visible u8 array at present time, so the
UI composites host-side at the same pipeline position (after MSAA resolve,
before present — the ImGui pass slot, pipeline_parameters.rs:264-269) using
PIL's text rasterizer as the font atlas. Semantics kept: translucent window
background (src-alpha blend), clip to window rect, per-line indent = span
depth, timing text in µs.
"""

from __future__ import annotations

import numpy as np

from renderer_tpu.engine.profiling import Profiler
from renderer_tpu.engine.stats import format_bytes, memory_usage


def draw_hud(
    img: np.ndarray,
    profiler: Profiler | None = None,
    extra_lines: list[str] | None = None,
    *,
    origin: tuple[int, int] = (8, 8),
    alpha: float = 0.65,
) -> np.ndarray:
    """Returns a copy of `img` (u8 [H,W,3]) with the stats window drawn."""
    from PIL import Image, ImageDraw

    lines: list[str] = list(extra_lines or [])
    if profiler is not None and profiler.enabled:
        for s in profiler.report():
            mean_us = 1e6 * s.total_s / max(s.count, 1)
            lines.append(f"{'  ' * s.depth}{s.name}: {mean_us:.0f} us")
    try:
        u = memory_usage()
        lines.append(f"HBM: {format_bytes(u['in_use'])} (peak {format_bytes(u['peak'])})")
    except Exception:
        pass
    if not lines:
        return img

    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil, "RGBA")
    x0, y0 = origin
    line_h = 12
    wmax = max(6 * max(len(line) for line in lines) + 12, 120)
    hmax = line_h * len(lines) + 10
    # translucent window background (ImGui-style src-alpha blend)
    draw.rectangle(
        [x0 - 4, y0 - 4, x0 + wmax, y0 + hmax],
        fill=(20, 20, 28, int(alpha * 255)),
    )
    for i, line in enumerate(lines):
        draw.text((x0, y0 + i * line_h), line, fill=(220, 220, 230, 255))
    return np.asarray(pil.convert("RGB"))
