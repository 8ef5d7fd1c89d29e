"""Scripted-input sandbox loop: the reference event-loop keybind semantics
driven headlessly through run_loop(events=...) + renderer_tpu.ui.io.

Pins the behaviors of examples/sandbox/src/main.rs:341-457: debug keys
Num0-7 switch the render mode, WASD moves the camera with the fixed
timestep, every event reaches the UI layer first and game handling is gated
on the previous frame's want_capture_* flags (main.rs:348-349), a left click
over the perf window goes to the UI while a click on empty space toggles
mouse-look (+ ConfigFlags::NO_MOUSE, main.rs:419-426), and relative mouse
motion turns the camera only while mouse-looking (main.rs:429-434).
"""

import numpy as np
import pytest

import renderer_tpu as rt
from renderer_tpu.assets import proxy
from renderer_tpu.core import math3d


class MiniSandbox:
    """Tiny run_loop scene source (the `sandbox=` injection seam): two
    procedural patches + the skinned character — full pipeline coverage at
    interpret-mode-friendly cost."""

    def __init__(self):
        self.registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        self.meshes = []
        for i in range(2):
            p, uv, n, t, idx = proxy._patch_geometry(
                200, 600, [-0.8, -0.5, -0.2], [0.8, 0.5, 0.2], seed=7 + i
            )
            self.meshes.append(builder.add_mesh(p, uv, n, t, idx))
        self.mat = self.registry.create_material(
            "m", rt.PbrMaterialParameters(base_color_factor=(0.8, 0.5, 0.3, 1))
        )
        self.character = proxy.make_skinned_character(builder, self.registry)
        builder.build()

    def build_scene(self, game_time: float, scene=None) -> rt.Scene:
        if scene is None:
            scene = rt.Scene(world_space=rt.GLTF)
        else:
            scene.clear()
        for i, mesh in enumerate(self.meshes):
            tr = math3d.trs(
                translation=np.array([i - 0.5, 0.8, -1.5], np.float32))
            scene.queue_mesh(mesh, self.mat, None, tr)
        playing = [(game_time % a.end_time, a)
                   for a in self.character.animations]
        self.character.queue_animated(scene, math3d.IDENTITY, playing)
        return scene


def test_scripted_events_drive_camera_ui_and_debug_mode(monkeypatch):
    import time

    from apps.sandbox import run_loop

    # keep the FIXED timestep deterministic: pacing would sleep
    # budget-minus-frame-time per frame (100 s here), so stub the sleep
    # out. immediate_present must stay False — with it the reference
    # forces too_slow=true and runs game time at REAL dt (main.rs:494-500),
    # which is exactly the nondeterminism this test avoids.
    monkeypatch.setattr(time, "sleep", lambda _s: None)

    # The perf window appears collapsed at UiContext's default (60, 60) with
    # width 640: its title bar spans x 60..700 at y 60..~77 — (100, 65) hits
    # it, (10, 90) is empty space.
    events = [
        [],                                             # f0: UI appears
        [("key_down", "Num3", []), ("key_up", "Num3", []),  # debug mode 3
         ("key_down", "W", [])],                        # start moving
        [("key_up", "W", []),                           # stop (before update)
         ("mouse_motion", 100.0, 65.0)],                # hover the window
        [("mouse_button_down", "left"),                 # f3: click ON window:
         ("mouse_button_up", "left")],                  #   gated, NO mouselook
        [("mouse_motion", 10.0, 90.0)],                 # f4: leave the window
        [("mouse_button_down", "left"),                 # f5: click empty space
         ("mouse_button_up", "left"),                   #   -> mouse-look ON
         ("mouse_motion_rel", 750.0, 0.0)],             #   turn: yaw -= 1.0
    ]
    # budget (1/target_fps) far above any interpret-mode frame time => the
    # fixed timestep branch always holds and movement is deterministic
    budget = 100.0
    stats = run_loop(
        frames=len(events), target_fps=1.0 / budget, width=128, height=80,
        msaa=1, show_hud=True, immediate_present=False, events=events,
        sandbox=MiniSandbox(),
    )

    # mode switch reached the renderer (Num3 -> debug 3, main.rs:362-369)
    assert stats["debug_mode"] == 3
    assert stats["image"].shape == (80, 128, 3)

    # W held for exactly one game update: |move| = speed * dt = 5 * budget,
    # along the camera orientation applied to +Z (main.rs:505-517)
    pos = np.array(stats["cam_position"])
    disp = pos - np.array([0.0, 1.6, 0.0])
    assert np.linalg.norm(disp) == pytest.approx(5.0 * budget, rel=1e-4)
    fwd = math3d.quat_to_mat3(math3d.quat_mul(
        math3d.quat_from_axis_angle([0, 1, 0], 1.56),
        math3d.quat_from_axis_angle([1, 0, 0], 0.0),
    )) @ np.array([0.0, 0.0, 1.0])
    assert np.allclose(disp / np.linalg.norm(disp), fwd, atol=1e-4)

    # capture gating: the f3 click over the window was consumed by the UI
    # (want_capture_mouse), so only the f5 empty-space click toggled
    # mouse-look -> final state ON (a broken gate would toggle twice -> OFF)
    assert stats["mouse_look"] is True
    # and the relative motion while mouse-looking turned the camera
    assert stats["cam_yaw"] == pytest.approx(1.56 - 1.0)
    assert stats["cam_pitch"] == pytest.approx(0.0)
    # NO_MOUSE suppresses UI mouse state during mouse-look (main.rs:425)
    assert not stats["want_capture_mouse"]


def test_events_without_hud_still_processed(monkeypatch):
    """show_hud=False must still promote+clear queued UI events every frame
    (UiIo accumulates otherwise) and keep the keybinds working."""
    import time

    from apps.sandbox import run_loop

    monkeypatch.setattr(time, "sleep", lambda _s: None)
    stats = run_loop(
        frames=2, target_fps=0.01, width=128, height=80, msaa=1,
        show_hud=False, events=[[("key_down", "Num2", [])], []],
        sandbox=MiniSandbox(),
    )
    assert stats["debug_mode"] == 2
    assert not stats["want_capture_keyboard"]  # no UI to capture input


def test_zero_frames_refused():
    from apps.sandbox import run_loop

    with pytest.raises(AssertionError, match="at least one frame"):
        run_loop(frames=0, sandbox=MiniSandbox())
