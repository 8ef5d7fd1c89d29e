"""Widget layer + input platform (Dear ImGui / imgui-sdl2-support analog).

Covers the reference behaviors: the SDL scancode→key table with its quirks
(imgui-sdl2-support/src/lib.rs:28-142), modifier recompute per key event
(lib.rs:145-162), event routing + capture-flag handshake (lib.rs:244-290,
main.rs:348-349), frame preparation incl. cursor sync (lib.rs:301-361), and
the sandbox's perf-window widget set: window Condition semantics
(main.rs:533-535), checkbox, tree nodes, right-aligned columns
(main.rs:769-847), plus compositing through the real UI pass."""

from dataclasses import dataclass

import numpy as np
import pytest

import renderer_tpu as rt
from renderer_tpu.overlay.perf_window import performance_stats_window, span_tree
from renderer_tpu.ui import Condition, Key, Platform, UiContext, UiIo, filter_event
from renderer_tpu.ui.font import get_font
from renderer_tpu.ui.io import SCANCODE_MAP
from renderer_tpu.ui.widgets import STYLE


class Harness:
    """One UiContext + UiIo + Platform; frame() feeds events then builds."""

    def __init__(self):
        self.ctx = UiContext()
        self.io = UiIo()
        self.platform = Platform()
        self.registry = rt.MaterialRegistry()

    def frame(self, build, events=()):
        for ev in events:
            self.platform.handle_event(self.io, ev)
        self.io.new_frame()
        ui = self.ctx.new_frame(self.io, self.registry)
        result = build(ui)
        return result, ui.end_frame()


def click(x, y):
    """Move + press + release in one frame (a clean click)."""
    return [("mouse_motion", x, y), ("mouse_button_down", "left"),
            ("mouse_button_up", "left")]


FONT = get_font()
TITLE_H = FONT.line_height + 6.0
PAD = STYLE["window_padding"]


# -- io / platform (lib.rs parity) ---------------------------------------------

class TestPlatform:
    def test_scancode_quirks(self):
        # top-row digits map to the KEYPAD keys (lib.rs:56-65) and Return
        # maps to Enter (lib.rs:66) — the reference's exact table
        assert SCANCODE_MAP["Num1"] == Key.KEYPAD_1
        assert SCANCODE_MAP["Num0"] == Key.KEYPAD_0
        assert SCANCODE_MAP["Kp1"] == Key.KEYPAD_1
        assert SCANCODE_MAP["Return"] == Key.ENTER
        assert SCANCODE_MAP["Grave"] == Key.GRAVE_ACCENT

    def test_unknown_scancode_ignored(self):
        io, p = UiIo(), Platform()
        assert p.handle_event(io, ("key_down", "NoSuchKey", []))
        io.new_frame()
        assert io.keys_pressed == set()  # lib.rs:135-138

    def test_modifiers_recomputed_every_key_event(self):
        # handle_key_modifier runs on every key event (lib.rs:145-162)
        io, p = UiIo(), Platform()
        p.handle_event(io, ("key_down", "A", ["shift"]))
        io.new_frame()
        assert io.key_down(Key.MOD_SHIFT) and io.key_down(Key.A)
        p.handle_event(io, ("key_up", "A", []))
        io.new_frame()
        assert not io.key_down(Key.MOD_SHIFT) and not io.key_down(Key.A)

    def test_no_mouse_flag_suppresses_mouse(self):
        # ConfigFlags::NO_MOUSE during mouse-look (main.rs:381,425,439)
        io, p = UiIo(), Platform()
        io.config_no_mouse = True
        p.handle_event(io, ("mouse_button_down", "left"))
        p.handle_event(io, ("mouse_wheel", 0, 2))
        p.handle_event(io, ("key_down", "W", []))  # keyboard still flows
        io.new_frame()
        assert not io.mouse_down["left"] and io.mouse_wheel == (0.0, 0.0)
        assert io.key_down(Key.W)

    def test_filter_event(self):
        # lib.rs:194-196: only the render window's events reach imgui
        ev = ("mouse_button_down", "left", {"window_id": 3})
        assert filter_event(3, ev) and not filter_event(4, ev)
        assert filter_event(4, ("mouse_button_down", "left"))

    def test_prepare_frame_delta_scale_and_cursor(self):
        io, p = UiIo(), Platform()
        p.prepare_frame(io, window_size=(100, 50), drawable_size=(200, 100),
                        mouse_pos=(10, 20), now=1.0)
        out = p.prepare_frame(io, window_size=(100, 50),
                              drawable_size=(200, 100), mouse_pos=(11, 21),
                              now=1.25)
        assert io.delta_time == pytest.approx(0.25)
        assert io.display_framebuffer_scale == (2.0, 2.0)
        io.new_frame()
        assert io.mouse_pos == (11.0, 21.0)
        assert out["system_cursor"] == "Arrow"  # lib.rs:165-177 map
        io.mouse_cursor = "text_input"
        assert p.prepare_frame(io, window_size=(100, 50))[
            "system_cursor"] == "IBeam"
        io.mouse_cursor = None  # hide (lib.rs:355-358)
        assert p.prepare_frame(io, window_size=(100, 50))[
            "system_cursor"] is None

    def test_want_set_mouse_pos_warp(self):
        io, p = UiIo(), Platform()
        io.mouse_pos = (40.0, 8.0)
        io.want_set_mouse_pos = True
        out = p.prepare_frame(io, window_size=(100, 50), mouse_pos=(0, 0))
        assert out["warp_mouse_to"] == (40.0, 8.0)  # lib.rs:329-332
        assert not io.want_set_mouse_pos

    def test_wheel_accumulates_within_frame(self):
        io, p = UiIo(), Platform()
        p.handle_event(io, ("mouse_wheel", 0, 1))
        p.handle_event(io, ("mouse_wheel", 1, 2))
        io.new_frame()
        assert io.mouse_wheel == (1.0, 3.0)


# -- widgets ---------------------------------------------------------------------

def window_build(body, title="W", **kw):
    def build(ui):
        out = None
        with ui.window(title, **kw) as visible:
            if visible:
                out = body(ui)
        return out
    return build


class TestWindow:
    def test_condition_appearing_applies_once(self):
        h = Harness()
        h.frame(window_build(lambda ui: None, size=(200, 100),
                             position=(10, 10)))
        st = h.ctx.windows["W"]
        assert st.size == (200.0, 100.0) and st.pos == (10.0, 10.0)
        # second frame with a different size: APPEARING does not re-apply
        h.frame(window_build(lambda ui: None, size=(500, 500),
                             position=(0, 0)))
        assert st.size == (200.0, 100.0) and st.pos == (10.0, 10.0)
        # ALWAYS re-applies every frame
        h.frame(window_build(lambda ui: None, size=(500, 500),
                             condition=Condition.ALWAYS))
        assert st.size == (500.0, 500.0)

    def test_title_drag_moves_window(self):
        h = Harness()
        build = window_build(lambda ui: None, position=(50, 50))
        h.frame(build)  # warm-up: hover uses last frame's rects
        tx, ty = 100.0, 50.0 + TITLE_H / 2
        h.frame(build, [("mouse_motion", tx, ty),
                        ("mouse_button_down", "left")])
        h.frame(build, [("mouse_motion", tx + 30, ty + 20)])
        assert h.ctx.windows["W"].pos == (80.0, 70.0)
        h.frame(build, [("mouse_button_up", "left")])
        h.frame(build, [("mouse_motion", tx + 99, ty + 99)])
        assert h.ctx.windows["W"].pos == (80.0, 70.0)  # drag ended

    def test_arrow_click_and_title_double_click_collapse(self):
        h = Harness()
        build = window_build(lambda ui: True, position=(50, 50))
        ran, st = h.frame(build)[0], h.ctx.windows["W"]
        assert ran is True
        # collapse arrow is at the title bar's left edge
        h.frame(build, click(50 + 8, 50 + TITLE_H / 2))
        assert st.collapsed
        (ran, _dl) = h.frame(build)
        assert ran is None  # body gated by `if visible`
        # expand again via the arrow, far apart in time (no double click)
        h.io.update_delta_time(1.0)
        h.frame(build, click(50 + 8, 50 + TITLE_H / 2))
        assert not st.collapsed
        # double-click on the title text area collapses
        h.io.update_delta_time(1.0)
        h.frame(build, click(50 + 100, 50 + TITLE_H / 2))
        h.io.update_delta_time(0.01)
        h.frame(build, click(50 + 100, 50 + TITLE_H / 2))
        assert st.collapsed

    def test_want_capture_mouse_tracks_hover(self):
        # the flag the event loop gates camera input on (main.rs:348-349)
        h = Harness()
        build = window_build(lambda ui: None, position=(50, 50))
        h.frame(build, [("mouse_motion", 100, 60)])
        h.frame(build)
        assert h.io.want_capture_mouse
        h.frame(build, [("mouse_motion", 500, 400)])
        assert not h.io.want_capture_mouse

    def test_click_raises_window_to_front(self):
        h = Harness()

        def build(ui):
            with ui.window("A", position=(0, 0), size=(100, 100)):
                pass
            with ui.window("B", position=(50, 0), size=(100, 100)):
                pass
        h.frame(build)
        assert h.ctx.window_order == ["A", "B"]
        # (60, 30) overlaps both; B is front-most so B stays; click A's
        # exclusive region to raise A
        h.frame(build, click(20, 30))
        assert h.ctx.window_order == ["B", "A"]
        # now the overlap belongs to A
        h.frame(build, [("mouse_motion", 60, 30)])
        ui = h.ctx.new_frame(h.io, h.registry)
        assert ui._hover_window == "A"
        ui.end_frame()

    def test_wheel_scrolls_content(self):
        h = Harness()
        build = window_build(
            lambda ui: [ui.text(f"line {i}") for i in range(60)],
            position=(0, 0), size=(200, 100))
        h.frame(build)
        h.frame(build, [("mouse_motion", 100, 50), ("mouse_wheel", 0, -2)])
        st = h.ctx.windows["W"]
        assert st.scroll_y == pytest.approx(6.0 * FONT.line_height)
        # content_h is the scroll-INVARIANT intrinsic height, and scrolling
        # clamps exactly at content_h - viewport_h with no creep
        viewport_h = 100.0 - TITLE_H - 2 * PAD
        for _ in range(50):
            h.frame(build, [("mouse_wheel", 0, -5)])
        intrinsic = st.content_h
        assert st.scroll_y == pytest.approx(intrinsic - viewport_h)
        h.frame(build, [("mouse_wheel", 0, -5)])
        assert st.content_h == pytest.approx(intrinsic)  # no scroll feedback
        assert st.scroll_y == pytest.approx(intrinsic - viewport_h)


class TestWidgets:
    def test_button_click_lifecycle(self):
        h = Harness()
        build = window_build(lambda ui: ui.button("Go"), position=(0, 0))
        assert h.frame(build)[0] is False
        bx = PAD + 6  # inside the button frame
        by = TITLE_H + PAD + 3
        assert h.frame(build, click(bx, by))[0] is True
        # press inside, release OUTSIDE: not a click (imgui semantics)
        assert h.frame(build, [("mouse_motion", bx, by),
                               ("mouse_button_down", "left")])[0] is False
        assert h.frame(build, [("mouse_motion", 300, 300),
                               ("mouse_button_up", "left")])[0] is False

    def test_checkbox_roundtrip(self):
        h = Harness()
        state = {"v": False}

        def body(ui):
            changed, state["v"] = ui.checkbox("Capture", state["v"])
            return changed
        build = window_build(body, position=(0, 0))
        h.frame(build)
        pos = (PAD + 3, TITLE_H + PAD + 3)
        assert h.frame(build, click(*pos))[0] and state["v"] is True
        assert h.frame(build, click(*pos))[0] and state["v"] is False

    def test_slider_drag_sets_value(self):
        h = Harness()
        state = {"v": 0.0}

        def body(ui):
            _, state["v"] = ui.slider_float("x", state["v"], 0.0, 10.0)
        build = window_build(body, position=(0, 0), size=(320, 240))
        h.frame(build)
        frame_w = 160.0  # 320 * 0.5
        y = TITLE_H + PAD + 3
        h.frame(build, [("mouse_motion", PAD + frame_w / 2, y),
                        ("mouse_button_down", "left")])
        assert state["v"] == pytest.approx(5.0, abs=0.2)
        # drag past the end clamps
        h.frame(build, [("mouse_motion", PAD + frame_w + 500, y)])
        assert state["v"] == 10.0
        h.frame(build, [("mouse_button_up", "left")])

    def test_input_text_focus_edit_defocus(self):
        h = Harness()
        state = {"v": "ab"}

        def body(ui):
            _, state["v"] = ui.input_text("name", state["v"], )
        build = window_build(body, position=(0, 0), size=(320, 240))
        h.frame(build)
        pos = (PAD + 10, TITLE_H + PAD + 3)
        h.frame(build, click(*pos))  # focus; cursor at end
        h.frame(build)
        assert h.io.want_text_input and h.io.want_capture_keyboard
        assert h.io.mouse_cursor == "text_input"  # synced cursor icon
        h.frame(build, [("text_input", "cd")])
        assert state["v"] == "abcd"
        h.frame(build, [("key_down", "Backspace", []),
                        ("key_up", "Backspace", [])])
        assert state["v"] == "abc"
        h.frame(build, [("key_down", "Home", []), ("key_up", "Home", []),
                        ("text_input", "x")])
        assert state["v"] == "xabc"
        h.frame(build, [("key_down", "Return", []),
                        ("key_up", "Return", [])])
        h.frame(build)
        assert not h.io.want_text_input

    def test_same_line_with_pos_is_window_local(self):
        # the span tree right-aligns columns with it (main.rs:829-845)
        h = Harness()

        def body(ui):
            ui.text("a")
            ui.same_line_with_pos(100.0)
            ui.text("b")
        _, dl = h.frame(window_build(body, position=(30, 40)))
        # the "b" glyph quad's left edge sits at window x + 100
        assert any(abs(p[0] - 130.0) < 1e-6 for p in dl._pos)

    def test_tree_node_toggles_and_persists(self):
        h = Harness()
        seen = []

        def body(ui):
            tok = ui.tree_node("root")
            if tok:
                seen.append(True)
                ui.text("child")
                tok.pop()
        build = window_build(body, position=(0, 0))
        h.frame(build)
        assert seen == []  # default closed
        pos = (PAD + 4, TITLE_H + PAD + FONT.line_height / 2)
        h.frame(build, click(*pos))
        assert seen == [True]
        h.frame(build)
        assert seen == [True, True]  # open state persists
        h.frame(build, click(*pos))
        assert seen == [True, True]


# -- perf window (main.rs:533-541, 769-847) ---------------------------------------

@dataclass
class FakeSpan:
    name: str
    depth: int
    total_s: float
    count: int = 1


SPANS = [
    FakeSpan("frame", 0, 10e-3),
    FakeSpan("upload", 1, 2e-3),
    FakeSpan("raster", 1, 6e-3),
    FakeSpan("binning", 2, 3e-3),
    FakeSpan("upload", 1, 1e-3),  # duplicate name: distinct id via push_id
]


class TestPerfWindow:
    def test_span_tree_hides_closed_subtrees(self):
        h = Harness()
        build = window_build(lambda ui: span_tree(ui, SPANS),
                             position=(0, 0), size=(400, 300))
        _, dl_closed = h.frame(build)
        # open the "raster" node: rows for its children appear
        for wid, _open in list(h.ctx.tree_open.items()):
            if wid[-1] == "raster":
                h.ctx.tree_open[wid] = True
        _, dl_open = h.frame(build)
        assert len(dl_open._tris) > len(dl_closed._tris)

    def test_duplicate_span_names_have_distinct_ids(self):
        # duplicate names as NON-leaf nodes: each persists an open-state
        # entry, and the per-parent name counts must keep their ids
        # distinct (leaf rows no longer store never-read open state)
        spans = [
            FakeSpan("frame", 0, 10e-3),
            FakeSpan("upload", 1, 2e-3),
            FakeSpan("copy", 2, 1e-3),
            FakeSpan("upload", 1, 1e-3),
            FakeSpan("copy", 2, 0.5e-3),
        ]
        h = Harness()
        build = window_build(lambda ui: span_tree(ui, spans),
                             position=(0, 0), size=(400, 300))
        h.frame(build)
        ids = [wid for wid in h.ctx.tree_open if wid[-1] == "upload"]
        assert len(ids) == 2 and ids[0] != ids[1]

    def test_leaf_rows_store_no_open_state(self):
        # span names vary over a session; the persistent UiContext must not
        # grow a tree_open entry per unique leaf id (they are never read)
        h = Harness()
        build = window_build(lambda ui: span_tree(ui, SPANS),
                             position=(0, 0), size=(400, 300))
        h.frame(build)
        leaf_names = {"upload", "binning"}
        assert not [w for w in h.ctx.tree_open if w[-1] in leaf_names]

    def test_children_of_duplicate_named_parents_distinct(self):
        """Two same-named tree nodes under push_id scopes that exit BEFORE
        the subtree renders (the span_tree pattern, main.rs:799) must still
        give their children distinct ids: the open token scopes child ids
        by the node's full id, not just its label (round-5 review
        finding — with label-only scoping, toggling one child toggled
        both)."""
        def body(ui):
            for n in (1, 2):
                with ui.push_id(n):
                    tok = ui.tree_node("parent", default_open=True)
                if tok is not None:
                    inner = ui.tree_node("child", default_open=(n == 1))
                    if inner is not None:
                        inner.pop()
                    tok.pop()

        h = Harness()
        h.frame(window_build(body, position=(0, 0), size=(300, 200)))
        ids = [w for w in h.ctx.tree_open if w[-1] == "child"]
        assert len(ids) == 2 and ids[0] != ids[1]
        # and their persisted states are independent
        states = [h.ctx.tree_open[w] for w in ids]
        assert sorted(states) == [False, True]

    def test_performance_stats_window_contract(self):
        # size [640,480] Appearing + collapsed(true, Appearing) + checkbox
        h = Harness()

        def build(ui):
            return performance_stats_window(ui, False, SPANS, SPANS[:1])
        h.frame(build)
        st = h.ctx.windows["Performance stats"]
        assert st.size == (640.0, 480.0) and st.collapsed
        # expand via the collapse arrow, then toggle the capture checkbox
        x, y = st.pos
        h.io.update_delta_time(1.0)
        h.frame(build, click(x + 8, y + TITLE_H / 2))
        assert not st.collapsed
        h.io.update_delta_time(1.0)
        flag, _ = h.frame(build, click(x + PAD + 3, y + TITLE_H + PAD + 3))
        assert flag is True


# -- through the real UI pass -------------------------------------------------------

class TestWidgetComposite:
    def test_widget_window_renders_through_pipeline(self):
        from renderer_tpu.core import math3d
        from tests.test_alpha_modes import quad

        registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        bg = quad(builder, 2.0)
        builder.build()
        red = registry.create_material(
            "red", rt.PbrMaterialParameters(base_color_factor=(1, 0, 0, 1)))
        scene = rt.Scene()
        scene.queue_mesh(bg, red, None, math3d.IDENTITY)
        renderer = rt.Renderer(registry, rt.RenderConfig(width=128, height=96))

        h = Harness()
        h.registry = registry

        def body(ui):
            ui.text("hi")
            ui.button("b")
        _, dl = h.frame(window_build(body, position=(8, 8), size=(70, 50),
                                     collapsed=False))
        base = renderer.render_frame(scene, debug_mode=1)
        img = renderer.render_frame(scene, debug_mode=1, ui=dl)
        inside = (slice(10, 50), slice(10, 70))
        assert (img[inside] != base[inside]).any()
        # pixels outside the window's outer rect are untouched
        np.testing.assert_array_equal(img[:, 90:], base[:, 90:])
        np.testing.assert_array_equal(img[70:, :], base[70:, :])


class TestDrawListExtend:
    def test_extend_offsets_vertices_and_commands(self):
        from renderer_tpu.ui import DrawList

        a = DrawList()
        a.add_rect_filled((0, 0), (10, 10), (255, 0, 0, 255))
        b = DrawList()
        b.push_clip_rect(5, 5, 20, 20)
        b.add_rect_filled((5, 5), (15, 15), (0, 255, 0, 255))
        b.pop_clip_rect()
        a.extend(b)
        packed = a.pack()
        assert packed["counts"][0] == 4  # two quads
        # second quad's triangles reference the offset vertex block
        assert packed["tris"][2].min() >= 4
        # and its command is the clipped one
        assert packed["tri_cmd"][2] == 1
        assert tuple(packed["clip"][1]) == (5.0, 5.0, 20.0, 20.0)


class TestRound5Hardening:
    def test_key_repeat_events_keep_editing(self):
        """SDL delivers key repeat as repeated KeyDown while held; each one
        must register a press (the reference forwards repeats,
        lib.rs:244-266) — held Backspace keeps deleting."""
        h = Harness()
        state = {"v": "abcdef"}

        def body(ui):
            _, state["v"] = ui.input_text("name", state["v"])
        build = window_build(body, position=(0, 0), size=(320, 240))
        h.frame(build)
        h.frame(build, click(PAD + 10, TITLE_H + PAD + 3))  # focus
        # key goes down once, then two REPEAT key_downs with no key_up
        h.frame(build, [("key_down", "Backspace", [])])
        h.frame(build, [("key_down", "Backspace", [])])
        h.frame(build, [("key_down", "Backspace", [])])
        assert state["v"] == "abc"

    def test_unknown_mouse_button_ignored(self):
        io = UiIo()
        io.add_mouse_button_event("x3", True)  # 6+-button mouse: dropped
        io.new_frame()
        assert not any(io.mouse_clicked.values())

    def test_text_focus_released_when_widget_disappears(self):
        """Collapsing the window (or removing the widget) while an
        input_text is focused must defocus it — want_text_input would
        otherwise capture the keyboard forever (round-5 review finding)."""
        h = Harness()
        state = {"v": "ab", "show": True}

        def body(ui):
            if state["show"]:
                _, state["v"] = ui.input_text("name", state["v"])
        build = window_build(body, position=(0, 0), size=(320, 240))
        h.frame(build)
        h.frame(build, click(PAD + 10, TITLE_H + PAD + 3))  # focus
        h.frame(build)
        assert h.io.want_text_input
        state["show"] = False  # widget no longer submitted
        h.frame(build)
        assert not h.io.want_text_input
        assert not h.io.want_capture_keyboard

    def test_scroll_reclamped_when_content_shrinks(self):
        """Scroll to the bottom of tall content, then shrink the content:
        scroll_y must re-clamp to the new end on the next frame (imgui
        re-clamps every Begin), not leave an empty window body."""
        h = Harness()
        state = {"lines": 60}

        def body(ui):
            for i in range(state["lines"]):
                ui.text(f"line {i}")
        build = window_build(body, position=(0, 0), size=(200, 100))
        h.frame(build)
        for _ in range(50):
            h.frame(build, [("mouse_motion", 100, 50), ("mouse_wheel", 0, -5)])
        st = h.ctx.windows["W"]
        viewport_h = 100.0 - TITLE_H - 2 * PAD
        assert st.scroll_y == pytest.approx(st.content_h - viewport_h)
        state["lines"] = 5  # content shrinks (still slightly > viewport)
        h.frame(build)  # recomputes content_h and re-clamps
        assert st.scroll_y == pytest.approx(
            max(0.0, st.content_h - viewport_h))
        state["lines"] = 1  # now smaller than the viewport: scroll to top
        h.frame(build)
        assert st.scroll_y == 0.0
