"""The sandbox "Performance stats" window, built with real widgets.

Port of the reference's interactive perf UI: the window itself
(examples/sandbox/src/main.rs:533-541 — size [640,480] Condition::Appearing,
collapsed(true, Appearing), a "Capture timings every frame" checkbox,
separators, one span tree for the latest frame and one for startup) and the
span-tree renderer (main.rs:769-847 — tree nodes per span with a stack of
open tokens, push_id per duplicate name, the %-of-root text right-aligned at
window_width - width - 50 with green→red tinting, and the µs/ms timing text
right-aligned at window_width - width - 150).

`build_hud_drawlist` (overlay/hud.py) remains the zero-state flat HUD; this
module is the interactive variant driven through renderer_tpu.ui.widgets +
renderer_tpu.ui.io — collapsible nodes, a working checkbox, window drag and
scroll — rendered through the same in-frame UI pass.
"""

from __future__ import annotations

from renderer_tpu.overlay.hud import _pct_color
from renderer_tpu.ui.widgets import Condition, Ui


def _mean_s(span) -> float:
    return span.total_s / max(span.count, 1)


def span_tree(ui: Ui, spans) -> None:
    """Render a flat depth-annotated span list as a collapsible tree
    (main.rs:769-847). `spans` is profiling.Span objects (name, depth,
    total_s, count)."""
    spans = list(spans)
    if not spans:
        return
    # denominator: the section's top-level spans (the %-of-frame column)
    root_s = sum(_mean_s(s) for s in spans if s.depth == 0)
    open_stack: list = []  # (depth, token-or-None); None = closed/invisible
    name_counts: dict[str, int] = {}
    for i, s in enumerate(spans):
        while open_stack and open_stack[-1][0] >= s.depth:
            _d, tok = open_stack.pop()
            if tok is not None:
                tok.pop()
        visible = not open_stack or open_stack[-1][1] is not None
        if not visible:
            # a closed ancestor: the row (and its subtree) is skipped, but
            # keep a placeholder so deeper descendants skip too
            open_stack.append((s.depth, None))
            continue
        has_children = i + 1 < len(spans) and spans[i + 1].depth > s.depth
        n = name_counts.get(s.name, 0)
        name_counts[s.name] = n + 1
        # duplicate names stay distinct ids (ui.push_id_int, main.rs:799)
        with ui.push_id(n):
            tok = ui.tree_node(s.name, leaf=not has_children)
        mean = _mean_s(s)
        pct = 100.0 * mean / root_s if root_s > 0 else 0.0
        pct_text = f"{pct:.0f}%"
        window_width = ui.window_size()[0]
        pct_w = ui.calc_text_size(pct_text)[0]
        ui.same_line_with_pos(window_width - pct_w - 50.0)
        ui.text_colored(_pct_color(pct), pct_text)
        us = mean * 1e6
        timing_text = f"{us / 1000:.1f} ms" if us >= 10000 else f"{us:.0f} us"
        timing_w = ui.calc_text_size(timing_text)[0]
        ui.same_line_with_pos(window_width - timing_w - 150.0)
        ui.text(timing_text)
        open_stack.append((s.depth, tok))
    while open_stack:
        _d, tok = open_stack.pop()
        if tok is not None:
            tok.pop()


def performance_stats_window(
    ui: Ui,
    capture_every_frame: bool,
    frame_spans,
    startup_spans,
) -> bool:
    """The reference sandbox's perf window (main.rs:533-541). Returns the
    (possibly toggled) capture flag."""
    with ui.window("Performance stats", size=(640.0, 480.0),
                   collapsed=True, condition=Condition.APPEARING) as visible:
        if visible:
            _changed, capture_every_frame = ui.checkbox(
                "Capture timings every frame", capture_every_frame)
            ui.separator()
            span_tree(ui, frame_spans)
            ui.separator()
            span_tree(ui, startup_spans)
    return capture_every_frame
