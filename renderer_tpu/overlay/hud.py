"""Performance HUD — the reference's in-app ImGui stats window.

The reference renders a live collapsible span tree with µs timings through an
ImGui pass (reference: renderer/src/imgui_support.rs:107-169,
examples/sandbox/src/main.rs:769-847). `build_hud_drawlist` builds the same
window as a renderer_tpu.ui.DrawList — translucent window background
(src-alpha blend), clipped to the window rect, per-line indent = span depth,
timing text in µs — rendered THROUGH the raster pipeline's UI pass inside the
jitted frame (raster/ui_stage.py), exactly the reference's pass position.
`draw_hud` (host-side PIL compositing) remains as a fallback for contexts
with no renderer, e.g. annotating already-rendered images.
"""

from __future__ import annotations

import numpy as np

from renderer_tpu.engine.profiling import Profiler
from renderer_tpu.engine.stats import format_bytes, memory_usage


def hud_lines(
    profiler: Profiler | None = None,
    extra_lines: list[str] | None = None,
) -> list[str]:
    """The stats-window text: perf-span tree (µs, indent = depth) + HBM."""
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
    return lines


def build_hud_drawlist(
    registry,
    profiler: Profiler | None = None,
    extra_lines: list[str] | None = None,
    *,
    origin: tuple[int, int] = (8, 8),
    alpha: float = 0.65,
    max_width: int | None = None,
):
    """The stats window as a DrawList for the in-frame UI pass."""
    from renderer_tpu.ui import DrawList, get_font

    lines = hud_lines(profiler, extra_lines)
    ui = DrawList()
    if not lines:
        return ui
    font = get_font()
    x0, y0 = origin
    line_h = font.line_height
    wmax = max(max(font.text_width(line) for line in lines) + 12, 120)
    if max_width is not None:
        wmax = min(wmax, max_width - x0)
    hmax = line_h * len(lines) + 10
    ui.push_clip_rect(x0 - 4, y0 - 4, x0 + wmax, y0 + hmax)
    ui.add_rect_filled(
        (x0 - 4, y0 - 4), (x0 + wmax, y0 + hmax), (20, 20, 28, int(alpha * 255))
    )
    for i, line in enumerate(lines):
        ui.add_text((x0, y0 + i * line_h), line, (220, 220, 230, 255), font,
                    registry)
    ui.pop_clip_rect()
    return ui


def draw_hud(
    img: np.ndarray,
    profiler: Profiler | None = None,
    extra_lines: list[str] | None = None,
    *,
    origin: tuple[int, int] = (8, 8),
    alpha: float = 0.65,
) -> np.ndarray:
    """FALLBACK path: returns a copy of `img` (u8 [H,W,3]) with the stats
    window composited host-side via PIL (for annotating images outside a
    render loop; the production HUD goes through build_hud_drawlist)."""
    from PIL import Image, ImageDraw

    lines = hud_lines(profiler, extra_lines)
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
