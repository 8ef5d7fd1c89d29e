"""Golden-image regression tests (CPU interpret mode, deterministic).

Small checked-in renders of fixed scenes; any pixel drift beyond ±2 u8 steps
on more than 0.5% of pixels fails. Regenerate deliberately with:
    python -m tests.test_golden regen
"""

from pathlib import Path

import numpy as np
import pytest

import renderer_tpu as rt
from apps.triangle import build_scene, build_triangle_assets
from renderer_tpu.core import math3d

GOLDEN = Path(__file__).parent / "golden"
W, H = 160, 96


def _render_cases():
    registry, meshes, material = build_triangle_assets()
    renderer = rt.Renderer(registry, rt.RenderConfig(width=W, height=H))
    scene = build_scene(meshes, material)
    cases = {}
    for mode in (0, 1, 2, 3, 4, 6):
        cases[f"triangle-mode{mode}"] = renderer.render_frame(scene, mode)

    msaa = rt.Renderer(registry, rt.RenderConfig(width=W, height=H, msaa_samples=4))
    cases["triangle-msaa4"] = msaa.render_frame(scene, 3)

    # layered alpha scene (blend over opaque + masked cutout)
    from tests.test_alpha_modes import quad

    reg2 = rt.MaterialRegistry()
    b2 = rt.VertexLibraryBuilder()
    far = quad(b2, 2.0)
    near = quad(b2, 1.5, half=0.3)
    b2.build()
    red = reg2.create_material("red", rt.PbrMaterialParameters(base_color_factor=(1, 0, 0, 1)))
    blue = reg2.create_material(
        "blue", rt.PbrMaterialParameters(base_color_factor=(0, 0, 1, 0.5),
                                         alpha_mode=rt.AlphaMode.BLENDED))
    ghost = reg2.create_material(
        "ghost", rt.PbrMaterialParameters(base_color_factor=(1, 1, 1, 0.3),
                                          alpha_cutoff=0.5,
                                          alpha_mode=rt.AlphaMode.ALPHA_TO_COVERAGE))
    s2 = rt.Scene()
    s2.queue_mesh(far, red, None, math3d.IDENTITY)
    s2.queue_mesh(near, blue, None, math3d.IDENTITY)
    s2.queue_mesh(near, ghost, None,
                  math3d.trs(translation=np.array([0.4, 0, 0.1], np.float32)))
    r2 = rt.Renderer(reg2, rt.RenderConfig(width=W, height=H))
    cases["alpha-layers"] = r2.render_frame(s2, 1)
    return cases


@pytest.mark.parametrize("name", [
    "triangle-mode0", "triangle-mode1", "triangle-mode2", "triangle-mode3",
    "triangle-mode4", "triangle-mode6", "triangle-msaa4", "alpha-layers",
])
def test_golden(name, _rendered={}):
    path = GOLDEN / "goldens.npz"
    if not path.exists():
        pytest.skip("goldens not generated (python -m tests.test_golden regen)")
    if not _rendered:
        _rendered.update(_render_cases())
    expected = np.load(path)[name]
    got = _rendered[name]
    diff = np.abs(got.astype(int) - expected.astype(int)).max(axis=-1)
    bad = (diff > 2).mean()
    assert bad < 0.005, f"{name}: {bad:.2%} of pixels drifted (max {diff.max()})"


def regenerate():
    GOLDEN.mkdir(exist_ok=True)
    cases = _render_cases()
    np.savez_compressed(GOLDEN / "goldens.npz", **cases)
    print(f"wrote {GOLDEN/'goldens.npz'} with {len(cases)} cases")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regenerate()
