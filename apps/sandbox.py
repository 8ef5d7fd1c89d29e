"""Sandbox demo — parity with the reference's full demo app
(reference: examples/sandbox/src/main.rs): Sponza at the origin plus the
animated Smol Ame model (scale 0.7, rotated -π/2 about Y, at (3, 0, -0.5)),
GLTF world space, camera starting at (0, 1.6, 0) with yaw 1.56.

Assets are read from the reference checkout (read-only) or
$RENDERER_TPU_ASSETS. Run: python -m apps.sandbox [out.png] [debug_mode] [time]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

import renderer_tpu as rt
from renderer_tpu.assets.gltf_loader import load_gltf
from renderer_tpu.core import math3d

ASSET_ROOT = Path(
    os.environ.get("RENDERER_TPU_ASSETS", "/root/reference/examples/sandbox/src")
)
SPONZA = ASSET_ROOT / "sponza/glTF/Sponza.gltf"
SMOL_AME = ASSET_ROOT / "smol-ame-by-seafoam/smol-ame.gltf"


class Sandbox:
    """Loads real assets when the .bin geometry buffers exist; otherwise
    reconstructs the workload via assets/proxy.py (the reference checkout
    ships the glTF JSON + all .ntex textures but not the LFS .bin buffers)."""

    def __init__(self, with_smol_ame: bool = True):
        self.registry = rt.MaterialRegistry()
        builder = rt.VertexLibraryBuilder()
        self.proxy_geometry = not (SPONZA.parent / "Sponza.bin").exists()
        if self.proxy_geometry:
            from renderer_tpu.assets import proxy

            print("# sponza .bin buffers missing; using proxy geometry with "
                  "real materials/textures", file=sys.stderr)
            self.sponza = proxy.load_gltf_proxy(SPONZA, builder, self.registry)
            if with_smol_ame:
                from renderer_tpu.assets import ntex as ntex_mod
                from renderer_tpu.materials.registry import Texture, TextureKind

                ame_ntex = SMOL_AME.parent / "terrariumtexsketchfab.ntex"
                _, mips = ntex_mod.decode_file(ame_ntex)
                tex = Texture(
                    mips, TextureKind.SRGB_COLOR, "terrariumtexsketchfab",
                    blocks_loader=lambda p=ame_ntex:
                        ntex_mod.read_blocks_file(p)[1],
                )
                self.smol_ame = proxy.make_skinned_character(
                    builder, self.registry, textures=[tex]
                )
            else:
                self.smol_ame = None
        else:
            self.sponza = load_gltf(SPONZA, builder, self.registry)
            self.smol_ame = (
                load_gltf(SMOL_AME, builder, self.registry) if with_smol_ame else None
            )
        self.library = builder.build()
        # constants of the demo scene, hoisted out of the per-frame rebuild
        # (the reference's main loop keeps these outside the loop too,
        # main.rs:549-583); the per-frame budget is the reference's ~20 µs
        # queue cost
        yaw, pitch = 1.56, 0.0
        self._cam_position = np.array([0.0, 1.6, 0.0], np.float32)
        self._cam_orientation = math3d.quat_mul(
            math3d.quat_from_axis_angle([0, 1, 0], yaw),
            math3d.quat_from_axis_angle([1, 0, 0], pitch),
        )
        self._ame_transform = math3d.trs(
            translation=np.array([3.0, 0.0, -0.5], np.float32),
            rotation=math3d.quat_from_axis_angle([0, 1, 0], -np.pi / 2),
            scale=np.array([0.7, 0.7, 0.7], np.float32),
        )

    def build_scene(self, game_time: float = 0.0,
                    scene: rt.Scene | None = None) -> rt.Scene:
        """main.rs:549-583: camera pose, Sponza at identity, Smol Ame with
        all animations playing at game_time % end_time.

        Pass the previous frame's `scene` to re-queue into it (Scene.clear —
        the reference's per-frame reset of one long-lived Scene; its draw
        SoA and joint palette are reused, skipping ~90 KB of fresh
        allocations per frame). Callers that need several live scenes at
        once (render_frames_device batches) omit it and get a fresh one."""
        if scene is None:
            scene = rt.Scene(world_space=rt.GLTF)
        else:
            scene.clear()
        scene.camera.position = self._cam_position
        scene.camera.orientation = self._cam_orientation
        self.sponza.queue(scene, math3d.IDENTITY)
        if self.smol_ame is not None:
            playing = [
                (game_time % a.end_time, a) for a in self.smol_ame.animations
            ]
            self.smol_ame.queue_animated(scene, self._ame_transform, playing)
        return scene


def orbit_camera(ang: float):
    """The canonical demo orbit: an ELLIPSE around the atrium (x radius 5,
    z radius 2 — the atrium is long and narrow), eye height 1.8, always
    facing the atrium center — ONE definition for every
    flythrough/bench/probe camera path (a change here moves all of them
    together; the measured 176k worst-frame pair demand in build_bench is
    for THIS path). Returns (position, orientation) for Scene.camera."""
    eye = np.array([5.0 * np.cos(ang), 1.8, 2.0 * np.sin(ang)], np.float32)
    target = np.array([0.0, 1.5, 0.0], np.float32)
    return math3d.look_at(eye, target, np.array([0, 1, 0], np.float32))


def build_bench(for_bench: bool = False):
    """Bench entry (bench.py): full sandbox assets at 1920×1080 with the
    reference's 4×MSAA (main.rs:114-117). Returns (sandbox, renderer, name);
    the bench rebuilds the scene per frame (camera + animation), matching the
    reference's main loop.

    for_bench=True turns the per-frame overflow check OFF — any device→host
    read during the timed loop serializes the dispatch pipeline on tunneled
    TPU runtimes, so the bench verifies the collected stats AFTER timing
    instead, growing the bucket and re-verifying if anything dropped
    (bench.py passes the verifier-measured pair/row capacities in
    explicitly; the RenderConfig default covers the orbit's measured
    demand, see the comment below)."""
    sandbox = Sandbox()
    # The ragged expansion (per-tile-row edge windows, raster/binning.py)
    # cut the orbit's measured worst frame from 776k bbox pairs to 176,269
    # near-exact pairs / 194,597 tile-rows (bench.py --verify over the
    # canonical timeline) — both fit the 1<<18 = 262,144 default with ~33%
    # / ~26% headroom; the binning sort and scatter are dense over the
    # static capacity, so the bucket is sized to the scene
    # (measure-then-allocate) rather than to the max.
    config = rt.RenderConfig(width=1920, height=1080, msaa_samples=4)
    renderer = rt.Renderer(sandbox.registry, config,
                           overflow_policy="off" if for_bench else "auto")
    name = "sponza+ame-1080p-msaa4"
    if sandbox.proxy_geometry:
        name += "-proxygeom"
    return sandbox, renderer, name


def run_loop(
    frames: int = 240,
    target_fps: float = 60.0,
    width: int = 1920,
    height: int = 1080,
    msaa: int = 4,
    debug_mode: int = 0,
    dump_path: str | None = None,
    show_hud: bool = True,
    immediate_present: bool = False,
    trace_path: str | None = None,
    events=None,
    sandbox=None,
):
    """Headless flying-camera demo loop — the sandbox main loop parity
    (main.rs:325-640): fixed-timestep game time with variable-dt fallback
    when a frame runs >20% over budget, frame pacing to the target rate,
    per-frame scene requeue + animation evaluation, and the interactive
    "Performance stats" window (main.rs:527-543) built through the widget
    layer every frame and rendered through the in-frame UI pass.

    `events` drives the reference event loop headlessly: events[i] is the
    list of SDL-shaped tuples (see renderer_tpu.ui.io.Platform) delivered on
    frame i. Keybind semantics follow main.rs:341-457 — debug keys Num0-7
    switch the render mode, WASD/QX move and LShift sprints (all gated on
    !want_capture_keyboard), left click toggles mouse-look (gated on
    !want_capture_mouse; sets ConfigFlags::NO_MOUSE), ("mouse_motion_rel",
    xrel, yrel) turns the camera while mouse-looking, Escape exits
    mouse-look, and 'I' keyup toggles immediate present. Without events the
    camera flies a circular path through the atrium (the interactive WASD
    camera's role in a headless run). Returns a stats dict (including the
    final frame as "image").

    `sandbox` reuses an already-loaded scene source (anything with
    `.registry` and `.build_scene(game_time, scene=)`) instead of loading
    the demo assets — back-to-back runs skip the asset reload."""
    import time

    from renderer_tpu.engine.profiling import Profiler
    from renderer_tpu.engine.stats import log_memory_usage
    from renderer_tpu.overlay.hud import build_hud_drawlist
    from renderer_tpu.overlay.perf_window import performance_stats_window
    from renderer_tpu.ui import Platform, UiContext, UiIo

    assert frames > 0, "run_loop needs at least one frame"
    if sandbox is None:
        sandbox = Sandbox()
    # trace_path: also retain per-event spans and write Chrome trace-event
    # JSON at the end (chrome://tracing / Perfetto — the reference's
    # profile-with-tracing output, main.rs:30-36)
    profiler = Profiler(enabled=True,
                        trace_events=200_000 if trace_path else 0)
    config = rt.RenderConfig(width=width, height=height, msaa_samples=msaa)
    # overflow_policy "off": any per-frame device→host stats read would
    # serialize the dispatch pipeline on tunneled TPU runtimes; the loop
    # checks the collected stats once at the end instead.
    renderer = rt.Renderer(sandbox.registry, config, profiler=profiler,
                           overflow_policy="off")
    log_memory_usage("assets loaded")

    interactive = events is not None
    ctx, io, platform = UiContext(), UiIo(), Platform()
    capture_every_frame = False
    frame_spans: list = []
    # interactive camera state (main.rs:94-117 initial pose — the same pose
    # Sandbox hoists for the static camera)
    cam_pos = np.array([0.0, 1.6, 0.0], np.float32)
    cam_yaw, cam_pitch = 1.56, 0.0
    dx = dy = dz = 0.0
    yaw_once = pitch_once = 0.0
    sprinting = mouse_look = False
    debug_value = int(debug_mode)
    _DEBUG_KEYS = {f"Num{n}": n for n in range(8)}

    budget = 1.0 / target_fps
    game_time = 0.0
    frame_times = []
    img = None
    scene = None
    prev = time.perf_counter()
    for i in range(frames):
        # -- event handling (main.rs:341-457): every event reaches the UI
        # first; game handling is gated on the PREVIOUS frame's capture
        # flags — the reference's exact handshake (main.rs:348-349)
        frame_events = events[i] if interactive and i < len(events) else ()
        for ev in frame_events:
            platform.handle_event(io, ev)
            handle_mouse = not io.want_capture_mouse
            handle_kb = not io.want_capture_keyboard
            kind, args = ev[0], ev[1:]
            if kind == "key_down" and handle_kb:
                sc = args[0]
                if sc in _DEBUG_KEYS:
                    debug_value = _DEBUG_KEYS[sc]
                elif sc == "W":
                    dz = 1.0
                elif sc == "S":
                    dz = -1.0
                elif sc == "A":
                    dx = 1.0
                elif sc == "D":
                    dx = -1.0
                elif sc == "Q":
                    dy = 1.0
                elif sc == "X":
                    dy = -1.0
                elif sc == "LShift":
                    sprinting = True
                elif sc == "Escape" and mouse_look:
                    mouse_look = False
                    io.config_no_mouse = False
            elif kind == "key_up" and handle_kb:
                sc = args[0]
                if sc == "I":
                    immediate_present = not immediate_present
                elif sc == "W" and dz > 0:
                    dz = 0.0
                elif sc == "S" and dz < 0:
                    dz = 0.0
                elif sc == "A" and dx > 0:
                    dx = 0.0
                elif sc == "D" and dx < 0:
                    dx = 0.0
                elif sc == "Q" and dy > 0:
                    dy = 0.0
                elif sc == "X" and dy < 0:
                    dy = 0.0
                elif sc == "LShift":
                    sprinting = False
            elif (kind == "mouse_button_down" and args[0] == "left"
                  and handle_mouse):
                mouse_look = not mouse_look
                io.config_no_mouse = mouse_look  # NO_MOUSE (main.rs:425)
            elif kind == "mouse_motion_rel" and mouse_look:
                yaw_once -= args[0] / 750.0
                pitch_once += args[1] / 750.0

        # -- game update (main.rs:486-521): movement with the frame's dt
        # (real frame time when over budget OR immediate-present — the
        # reference's too_slow covers both, main.rs:494-500)
        dt = (frame_times[-1]
              if frame_times and (immediate_present
                                  or frame_times[-1] > 1.2 * budget)
              else budget)
        if interactive:
            cam_yaw += yaw_once
            cam_pitch = float(np.clip(cam_pitch + pitch_once,
                                      -np.pi / 2, np.pi / 2))
            yaw_once = pitch_once = 0.0
            orient = math3d.quat_mul(
                math3d.quat_from_axis_angle([0, 1, 0], cam_yaw),
                math3d.quat_from_axis_angle([1, 0, 0], cam_pitch),
            )
            if dx != 0.0 or dy != 0.0 or dz != 0.0:
                ctl = np.array([dx, dy, dz], np.float32)
                ctl /= np.linalg.norm(ctl)
                speed = 10.0 if sprinting else 5.0
                cam_pos = cam_pos + (
                    math3d.quat_to_mat3(orient) @ ctl) * speed * dt
            pos = cam_pos
        else:
            # flying camera: circle the atrium, always facing its center
            pos, orient = orbit_camera(2.0 * np.pi * (i / max(frames, 1)))

        scene = sandbox.build_scene(game_time, scene=scene)
        scene.camera.position = pos
        scene.camera.orientation = orient
        ui = None
        if show_hud:
            # the interactive "Performance stats" window (main.rs:527-543),
            # built with real widgets and rendered THROUGH the raster
            # pipeline (the reference's ImGui pass; imgui_support.rs:107-169)
            # plus a one-line fps status. Only host-side data — no device
            # reads.
            platform.prepare_frame(io, window_size=(width, height),
                                   now=time.perf_counter())
            io.new_frame()
            uif = ctx.new_frame(io, sandbox.registry)
            if capture_every_frame or not frame_spans:
                from copy import copy

                frame_spans = [copy(s) for s in profiler.report()]
            startup_spans = getattr(profiler, "sections", {}).get(
                "startup (first frame incl. compile)", [])
            capture_every_frame = performance_stats_window(
                uif, capture_every_frame, frame_spans, startup_spans)
            ui = uif.end_frame()
            fps_now = 1.0 / max(frame_times[-1], 1e-6) if frame_times else 0.0
            status = build_hud_drawlist(
                sandbox.registry, None,
                [f"{width}x{height} msaa{msaa}  {fps_now:.0f} fps "
                 f"(paced {target_fps:.0f})"],
                max_width=width, show_memory=False)
            status.extend(ui)
            ui = status
        elif interactive:
            # no HUD, but queued UI events must still be promoted+cleared
            # every frame (UiIo accumulates otherwise) — there is no UI to
            # capture input, so the want_* flags stay False
            platform.prepare_frame(io, window_size=(width, height),
                                   now=time.perf_counter())
            io.new_frame()
        img = renderer.render_frame_device(scene, debug_mode=debug_value,
                                           ui=ui)
        if i == 0:
            img.block_until_ready()
            profiler.snapshot("startup (first frame incl. compile)")

        now = time.perf_counter()
        frame_time = now - prev
        frame_times.append(frame_time)
        # fixed timestep unless >20% over budget; with immediate present the
        # reference forces too_slow=true so game time runs at REAL time
        # (main.rs:486-521, 494-500)
        if immediate_present or frame_time > 1.2 * budget:
            game_time += frame_time
        else:
            game_time += budget
        # frame pacing (main.rs:628-639): sleep the REMAINDER of the budget
        # after this frame's work (deadline = prev + budget), not a full
        # budget on top of it; immediate_present skips pacing (the
        # sandbox's 'I' key / SwapchainSettings.immediate_present toggle)
        if not immediate_present:
            sleep_for = budget - (time.perf_counter() - prev)
            if sleep_for > 0:
                time.sleep(sleep_for)
        prev = time.perf_counter()

    img.block_until_ready()
    out = np.asarray(img)
    ft = np.array(frame_times[3:]) if len(frame_times) > 6 else np.array(frame_times)
    stats = {
        "frames": frames,
        # render throughput (frame time excludes the pacing sleep)
        "render_fps": float(1.0 / ft.mean()),
        "p99_ms": float(np.percentile(ft, 99) * 1e3),
        "paced_to": target_fps,
        "debug_mode": debug_value,
        "immediate_present": immediate_present,
        "image": out,
    }
    if interactive:
        stats.update({
            "cam_position": [float(v) for v in cam_pos],
            "cam_yaw": cam_yaw,
            "cam_pitch": cam_pitch,
            "mouse_look": mouse_look,
            "want_capture_mouse": io.want_capture_mouse,
            "want_capture_keyboard": io.want_capture_keyboard,
        })
    frame_stats = renderer.frame_stats()  # end-of-run device stats check
    if frame_stats:
        dropped = sum(v for k, v in frame_stats.items() if "overflow" in k)
        if dropped:
            print(f"run_loop WARNING: last frame dropped {dropped} bin pairs "
                  f"(raise RenderConfig.pair_capacity): {frame_stats}")
        stats["frame_stats"] = frame_stats
    if dump_path:
        from PIL import Image

        # the HUD is already IN the frame (rendered through the UI pass)
        Image.fromarray(out).save(dump_path)
    if trace_path:
        n = profiler.export_chrome_trace(trace_path)
        print(f"wrote {n} trace events to {trace_path}")
    print("run_loop:", {k: v for k, v in stats.items() if k != "image"})
    return stats


def flythrough(
    frames: int = 16,
    out_dir: str = "/tmp/flythrough",
    width: int = 1280,
    height: int = 720,
    msaa: int = 4,
    debug_mode: int = 0,
):
    """Offline flythrough: render `frames` camera-path frames in ONE
    device-resident dispatch (Renderer.render_frames_device — lax.scan over
    packed frame blobs, the TPU-native throughput mode) and dump numbered
    PNGs. The offline counterpart of run_loop (no UI pass; the HUD rides the
    interactive path). Overflow policy "sync": the returned batch is always
    complete — any dropped work re-renders at grown capacity.

    Run: python -m apps.sandbox flythrough [frames] [out_dir] ..."""
    from PIL import Image

    sandbox = Sandbox()
    config = rt.RenderConfig(width=int(width), height=int(height),
                             msaa_samples=int(msaa))
    renderer = rt.Renderer(sandbox.registry, config, overflow_policy="sync")
    frames = int(frames)
    scenes = []
    for i in range(frames):
        pos, orient = orbit_camera(2.0 * np.pi * (i / max(frames, 1)))
        scene = sandbox.build_scene(i / 60.0)
        scene.camera.position = pos
        scene.camera.orientation = orient
        scenes.append(scene)
    imgs, _stats = renderer.render_frames_device(scenes,
                                                 debug_mode=int(debug_mode))
    out = np.asarray(imgs)  # ONE readback for the whole batch
    os.makedirs(out_dir, exist_ok=True)
    for i in range(frames):
        Image.fromarray(out[i]).save(os.path.join(out_dir, f"{i:04d}.png"))
    print(f"wrote {frames} frames to {out_dir} "
          f"({out.shape[2]}x{out.shape[1]}, one scan dispatch)")
    return out


def main(out_path: str = "sandbox.png", debug_mode: int = 0, game_time: float = 1.0):
    sandbox = Sandbox()
    config = rt.RenderConfig(width=1280, height=720)
    renderer = rt.Renderer(sandbox.registry, config)
    scene = sandbox.build_scene(float(game_time))
    img = renderer.render_frame(scene, debug_mode=int(debug_mode))
    from PIL import Image

    Image.fromarray(img).save(out_path)
    print(f"wrote {out_path} ({img.shape[1]}x{img.shape[0]}), "
          f"{scene.draw_count} draws")
    return img


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "flythrough":
        flythrough(*sys.argv[2:])
    else:
        main(*sys.argv[1:])
