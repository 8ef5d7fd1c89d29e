"""tools/frame_capture: the RenderDoc / debug-utils analog (reference names
every Vulkan object for capture tooling, debug_utils.rs:16-28). The capture
re-runs the real stage functions, so its dumps must agree with the composed
frame it also writes."""

import json

import numpy as np

import renderer_tpu as rt
from tools.frame_capture import capture


def test_triangle_capture_is_consistent(tmp_path):
    config = rt.RenderConfig(width=256, height=192, msaa_samples=1)
    summary = capture(tmp_path, "triangle", config=config)

    for name in ("00-final.png", "01-visibility.png", "02-depth.png",
                 "03-bins.png", "capture.json"):
        assert (tmp_path / name).exists(), name

    from PIL import Image

    final = np.asarray(Image.open(tmp_path / "00-final.png"))
    vis = np.asarray(Image.open(tmp_path / "01-visibility.png"))
    depth = np.asarray(Image.open(tmp_path / "02-depth.png"))
    assert final.shape[:2] == vis.shape[:2] == depth.shape[:2] == (192, 256)

    # the visibility buffer's coverage IS the composed frame's coverage at
    # msaa 1 (hashed colors are never black on covered pixels; the triangle
    # scene's lit shading is never black either)
    covered = vis.any(axis=-1)
    lit = final.any(axis=-1)
    assert covered.sum() > 1000
    np.testing.assert_array_equal(covered, lit)
    # depth is written exactly where coverage is (reverse-Z clear = 0)
    np.testing.assert_array_equal(depth > 0, covered)

    s = json.loads((tmp_path / "capture.json").read_text())
    assert s["stats"]["total_pairs"] == sum(s["pairs_per_class"])
    assert s["overflow_per_class"] == [0]
    assert s["busiest_tile_pairs"] >= 1
    assert summary["num_tris"] == 2
