"""bf16 shading path (RenderConfig.bf16_shading): texture filtering +
lighting at bf16, with texel addressing, depth, edges and compositing kept
f32 (raster/shade.py). The 8-bit tonemapped output must stay within
tolerance of the f32 path — the SURVEY §7 performance lever, with the
precision contract pinned here."""

import numpy as np

import renderer_tpu as rt
from tests.test_sandbox_golden import _render


def test_bf16_close_to_f32_on_full_scene():
    f32_img, f32_stats = _render(msaa=1, bf16=False)
    b16_img, b16_stats = _render(msaa=1, bf16=True)
    assert sum(v for k, v in b16_stats.items() if "overflow" in k) == 0
    diff = np.abs(f32_img.astype(int) - b16_img.astype(int))
    # bf16 has ~2-3 decimal digits; after ACES tonemap + u8 quantization the
    # error is a few quanta. Pin mean and a drift-fraction bound.
    assert diff.mean() < 2.0, f"bf16 mean drift {diff.mean():.2f}"
    bad = (diff.max(axis=-1) > 8).mean()
    assert bad < 0.01, f"{bad:.2%} of pixels drifted > 8 u8 steps"


def test_bf16_geometry_identical():
    """Coverage/depth/visibility must be UNAFFECTED by bf16 shading (edges
    and depth stay f32): the covered-pixel masks of the two paths are
    identical even where colors differ."""
    f32_img, _ = _render(msaa=1, bf16=False)
    b16_img, _ = _render(msaa=1, bf16=True)
    np.testing.assert_array_equal(
        f32_img.sum(axis=-1) > 0, b16_img.sum(axis=-1) > 0
    )


def test_bf16_is_a_static_jit_key():
    c1 = rt.RenderConfig(bf16_shading=True).validate()
    assert c1.bf16_shading
    assert not rt.RenderConfig().bf16_shading
