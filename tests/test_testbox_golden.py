"""Real-geometry golden: testbox.glb (the reference mount's only asset with
actual vertex/index/texture bytes — `examples/sandbox/src/testbox/
testbox.glb`) rendered through the full TPU pipeline and regression-locked
against a checked-in golden, so real bytes flow through vertex stage →
raster → shade every round, not just through loader tests (round-3 verdict
item 4). Regenerate deliberately:
    python -m tests.test_testbox_golden regen
"""

from pathlib import Path

import numpy as np
import pytest

import renderer_tpu as rt

REF = Path("/root/reference/examples/sandbox/src")
needs_assets = pytest.mark.skipif(
    not (REF / "testbox/testbox.glb").exists(),
    reason="testbox.glb not mounted",
)
GOLDEN = Path(__file__).parent / "golden" / "testbox-golden.npz"
W, H = 160, 96


def _render(msaa: int = 4):
    from apps import testbox as testbox_app

    registry, _library, gltf = testbox_app.load_testbox()
    scene = testbox_app.build_single(gltf)
    renderer = rt.Renderer(
        registry,
        rt.RenderConfig(width=W, height=H, tile_h=16, msaa_samples=msaa),
    )
    img = renderer.render_frame(scene, debug_mode=0)
    return img, renderer.frame_stats()


@needs_assets
def test_testbox_real_geometry_golden():
    if not GOLDEN.exists():
        pytest.skip("golden not generated (python -m tests.test_testbox_golden regen)")
    img, stats = _render()
    assert sum(v for k, v in stats.items() if "overflow" in k) == 0, stats
    expected = np.load(GOLDEN)["testbox-msaa4"]
    diff = np.abs(img.astype(int) - expected.astype(int)).max(axis=-1)
    bad = (diff > 2).mean()
    assert bad < 0.005, f"{bad:.2%} of pixels drifted (max {diff.max()})"
    # the box must actually cover a meaningful share of the frame
    assert (img.sum(axis=-1) > 0).mean() > 0.15


@needs_assets
def test_testbox_field_covers_and_stays_in_capacity():
    """The instanced field (real index/vertex patterns at ~276k triangles,
    apps/configs.py bench tag testbox-field) at reduced resolution: every
    instance queues, no bucket overflows, most of the frame is covered."""
    from apps import testbox as testbox_app

    registry, _library, gltf = testbox_app.load_testbox()
    scene = testbox_app.build_field(gltf, nx=3, nz=3)  # 27k tris at test size
    renderer = rt.Renderer(
        registry, rt.RenderConfig(width=256, height=128, tile_h=16)
    )
    img = renderer.render_frame(scene, debug_mode=0)
    stats = renderer.frame_stats()
    assert sum(v for k, v in stats.items() if "overflow" in k) == 0, stats
    assert (img.sum(axis=-1) > 0).mean() > 0.10


def regenerate():
    GOLDEN.parent.mkdir(exist_ok=True)
    img, stats = _render()
    np.savez_compressed(GOLDEN, **{"testbox-msaa4": img})
    print(f"wrote {GOLDEN} (stats: {stats})")


if __name__ == "__main__":
    import sys

    from tests import conftest  # noqa: F401 — force the CPU interpret platform

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regenerate()
