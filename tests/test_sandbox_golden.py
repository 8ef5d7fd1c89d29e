"""Mini-sandbox golden: a deterministic multi-draw scene exercising every
production pass at once — multi-tile binning of procedural patch geometry
(the proxy generator the headline bench uses), all three alpha classes,
skeletal animation with a real joint palette, texture-atlas sampling with
mips, 4×MSAA with candidate-deduped shading, and the raster-path HUD overlay
— regression-locked against a checked-in golden. Regenerate deliberately:
    python -m tests.test_sandbox_golden regen
"""

from pathlib import Path

import numpy as np
import pytest

import renderer_tpu as rt
from renderer_tpu.assets import proxy
from renderer_tpu.core import math3d

GOLDEN = Path(__file__).parent / "golden" / "sandbox-golden.npz"
W, H = 160, 96


def _build():
    registry = rt.MaterialRegistry()
    builder = rt.VertexLibraryBuilder()

    # checker texture with a full mip chain (deterministic; exercises atlas
    # mip selection without needing the asset mount)
    base = np.zeros((64, 64, 4), np.uint8)
    base[..., 3] = 255
    yy, xx = np.mgrid[0:64, 0:64]
    checker = ((xx // 8 + yy // 8) % 2).astype(np.uint8)
    base[..., 0] = 40 + 200 * checker
    base[..., 1] = 120
    base[..., 2] = 240 - 200 * checker
    mips = [base]
    m = base
    while m.shape[0] > 1:
        m = m[::2, ::2]
        mips.append(m)
    tex = rt.Texture(mips, rt.TextureKind.SRGB_COLOR, "checker")

    # 6 procedural patches (the bench's proxy generator) in a ring
    meshes = []
    for i in range(6):
        p, uv, n, t, idx = proxy._patch_geometry(
            400, 1200, [-0.8, -0.5, -0.2], [0.8, 0.5, 0.2], seed=100 + i
        )
        meshes.append(builder.add_mesh(p, uv, n, t, idx))

    mats = [
        registry.create_material(
            "tex-opaque", rt.PbrMaterialParameters(base_color=tex)
        ),
        registry.create_material(
            "masked",
            rt.PbrMaterialParameters(
                base_color=tex, alpha_cutoff=0.4,
                base_color_factor=(1, 1, 1, 0.9),
                alpha_mode=rt.AlphaMode.ALPHA_TO_COVERAGE,
            ),
        ),
        registry.create_material(
            "blended",
            rt.PbrMaterialParameters(
                base_color_factor=(0.2, 0.9, 0.4, 0.45),
                alpha_mode=rt.AlphaMode.BLENDED,
            ),
        ),
    ]

    character = proxy.make_skinned_character(builder, registry)
    builder.build()
    return registry, meshes, mats, character


def _perf_window_drawlist(registry):
    """The interactive 'Performance stats' window (perf_window.py) with
    deterministic spans, expanded at a fixed rect — two UiContext frames so
    the Condition::Appearing state settles before the golden frame."""
    from renderer_tpu.engine.profiling import Span
    from renderer_tpu.overlay.perf_window import performance_stats_window
    from renderer_tpu.ui import UiContext, UiIo

    frame_spans = [Span("frame", 0, 1.0e-3, 1), Span("raster", 1, 0.8e-3, 1),
                   Span("post", 1, 0.05e-3, 1)]
    startup_spans = [Span("load", 0, 0.5, 1)]
    ctx, io = UiContext(), UiIo()
    dl = None
    for _ in range(2):
        io.new_frame()
        ui = ctx.new_frame(io, registry)
        performance_stats_window(ui, False, frame_spans, startup_spans)
        dl = ui.end_frame()
        st = ctx.windows["Performance stats"]
        st.collapsed = False
        st.pos = (4.0, 4.0)
        st.size = (150.0, 88.0)
    return dl


def _render(msaa: int = 4, fast: bool = False, bf16: bool = False,
            perf_window: bool = False):
    registry, meshes, mats, character = _build()
    scene = rt.Scene(world_space=rt.GLTF)
    scene.camera.position = np.array([0.0, 0.9, 2.6], np.float32)
    scene.camera.orientation = math3d.quat_from_axis_angle([0, 1, 0], np.pi)
    for i, mesh in enumerate(meshes):
        ang = 2 * np.pi * i / len(meshes)
        tr = math3d.trs(
            translation=np.array(
                [1.2 * np.cos(ang), 0.6 + 0.1 * i, 1.2 * np.sin(ang)], np.float32
            ),
            rotation=math3d.quat_from_axis_angle([0, 1, 0], ang),
        )
        scene.queue_mesh(mesh, mats[i % 3], None, tr)
    playing = [(0.4 % a.end_time, a) for a in character.animations]
    character.queue_animated(scene, math3d.IDENTITY, playing)

    # the HUD span-tree window with deterministic timings (one collapsed
    # section, one expanded with low/high %-of-frame tints) — locks the
    # reference's perf-window structure (main.rs:769-847) into the golden
    from renderer_tpu.engine.profiling import Profiler, Span
    from renderer_tpu.overlay.hud import build_hud_drawlist

    prof = Profiler(enabled=True)
    prof.sections = {"startup": [Span("load", 0, 0.5, 1)]}
    prof._spans = {
        (0, "frame"): Span("frame", 0, 1.0e-3, 1),
        (1, "raster"): Span("raster", 1, 0.8e-3, 1),
        (1, "post"): Span("post", 1, 0.05e-3, 1),
    }
    prof._order = list(prof._spans)
    if perf_window:
        # the interactive widget-layer window instead of the flat HUD
        ui = _perf_window_drawlist(registry)
    else:
        ui = build_hud_drawlist(registry, prof, ["mini sandbox"],
                                collapsed={"startup"}, max_width=W,
                                show_memory=False)

    # the DEFAULT config is the reference device's exact sampler (per-tap
    # sRGB + 16x anisotropy, descriptors.rs:90-105); fast is the opt-in
    config = rt.RenderConfig(width=W, height=H, msaa_samples=msaa,
                             bf16_shading=bf16)
    if fast:
        config = config.fast_sampler()
    renderer = rt.Renderer(registry, config)
    img = renderer.render_frame(scene, debug_mode=0, ui=ui)
    stats = renderer.frame_stats()
    return img, stats


def _check_against(key, **render_kw):
    if not GOLDEN.exists():
        pytest.skip("golden not generated (python -m tests.test_sandbox_golden regen)")
    golden = np.load(GOLDEN)
    if key not in golden:
        pytest.skip(f"{key} not in golden (regenerate)")
    img, stats = _render(**render_kw)
    assert sum(v for k, v in stats.items() if "overflow" in k) == 0, stats
    expected = golden[key]
    diff = np.abs(img.astype(int) - expected.astype(int)).max(axis=-1)
    bad = (diff > 2).mean()
    assert bad < 0.005, f"{bad:.2%} of pixels drifted (max {diff.max()})"
    return img


def test_sandbox_scale_golden():
    """The DEFAULT configuration — since round 5 this is the reference
    device's exact sampler (per-tap sRGB + aniso16, descriptors.rs:90-105)
    under the sandbox's 4xMSAA: the pixel-accurate north-star config."""
    _check_against("mini-sandbox-msaa4")


def test_sandbox_perf_window_golden():
    """The interactive 'Performance stats' window (widgets + perf_window.py)
    rendered through the UI pass — golden-locks the widget layer's output
    through the real pipeline (reference window: main.rs:527-543, span tree
    main.rs:769-847), complementing the flat-HUD golden above."""
    _check_against("mini-sandbox-perfwin", perf_window=True)


def test_sandbox_fast_sampler_msaa4_golden():
    """The fast_sampler() OPT-IN (decode-after-filter sRGB + aniso4) under
    MSAA4, locked by its own golden — the cheap mode stays pinned now that
    the exact sampler is the default."""
    _check_against("mini-sandbox-fast-msaa4", fast=True, msaa=4)


def test_sandbox_fast_vs_default_drift():
    """The default (exact) sampler locked by its msaa1 golden, and the fast
    opt-in pinned CLOSE to it — the documented deviation is bounded, not
    unbounded drift. Rendered at msaa1: the 16-tap exact sampler is ~8x the
    filtering cost and interpret mode pays it per sample; MSAA semantics are
    locked by the msaa4 goldens above."""
    img = _check_against("mini-sandbox-exact", msaa=1)
    fast = _render(msaa=1, fast=True)[0]
    diff = np.abs(img.astype(int) - fast.astype(int))
    # measured ~4.4 u8 mean: dominated by aniso16 sharpening distant
    # checkered floors vs the 4-tap fast mode, plus the bounded sRGB filter-
    # order deviation — bounded drift, not divergence
    assert (diff.mean()) < 8.0, f"default vs fast mean drift {diff.mean():.2f}"


def regenerate(only: str | None = None):
    """Regenerate all keys, or `only` one key merged into the existing npz
    (adding a new key must not re-render — and silently re-baseline — the
    committed ones)."""
    GOLDEN.parent.mkdir(exist_ok=True)
    renders = {
        "mini-sandbox-msaa4": dict(),
        "mini-sandbox-exact": dict(msaa=1),
        "mini-sandbox-fast-msaa4": dict(fast=True, msaa=4),
        "mini-sandbox-perfwin": dict(perf_window=True),
    }
    keep = dict(np.load(GOLDEN)) if (only and GOLDEN.exists()) else {}
    for key, kw in renders.items():
        if only and key != only:
            continue
        img, stats = _render(**kw)
        keep[key] = img
        print(f"{key}: stats {stats}")
    np.savez_compressed(GOLDEN, **keep)
    print(f"wrote {GOLDEN} ({sorted(keep)})")


if __name__ == "__main__":
    import sys

    from tests import conftest  # noqa: F401 — force the CPU interpret
    # platform so the golden matches what pytest renders

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regenerate(only=sys.argv[2] if len(sys.argv) > 2 else None)
