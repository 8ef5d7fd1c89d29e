"""make_ntex offline compiler + native BC7 encoder round trips, validated
against Pillow's independent BC7 decoder."""

import numpy as np
import pytest

from renderer_tpu.assets import ntex
from renderer_tpu.tools import native


def _test_image(w=64, h=64, seed=7):
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    img = np.stack([x, y, (x + y) / 2, np.full_like(x, 255)], -1).astype(np.uint8)
    noise = rng.normal(0, 8, img[..., :3].shape)
    img[..., :3] = np.clip(img[..., :3] + noise, 0, 255).astype(np.uint8)
    return img


def _psnr(a, b):
    err = (a.astype(np.float64) - b.astype(np.float64)) ** 2
    return 10 * np.log10(255**2 / max(err[..., :3].mean(), 1e-9))


def test_cpp_encoder_quality():
    img = _test_image()
    blocks = native.bc7_encode_mode6(img)
    decoded = ntex._decode_bc7(blocks.tobytes(), 64, 64)
    assert _psnr(decoded, img) > 28.0


def test_numpy_fallback_quality():
    img = _test_image()
    lib, failed = native._lib, native._load_failed
    try:
        native._lib, native._load_failed = None, True
        blocks = native.bc7_encode_mode6(img)
    finally:
        native._lib, native._load_failed = lib, failed
    decoded = ntex._decode_bc7(blocks.tobytes(), 64, 64)
    assert _psnr(decoded, img) > 28.0


def test_alpha_preserved():
    img = _test_image()
    img[..., 3] = (np.arange(64)[:, None] * 4).astype(np.uint8)
    blocks = native.bc7_encode_mode6(img)
    decoded = ntex._decode_bc7(blocks.tobytes(), 64, 64)
    err = np.abs(decoded[..., 3].astype(int) - img[..., 3].astype(int))
    assert err.mean() < 8


def test_cli_roundtrip(tmp_path):
    from PIL import Image

    from tools.make_ntex import main

    img = _test_image(32, 16)
    src = tmp_path / "tex.png"
    Image.fromarray(img).save(src)
    assert main(["--silent", "--assume-color", str(src)]) == 0
    header, mips = ntex.decode((tmp_path / "tex.ntex").read_bytes())
    assert (header.width, header.height) == (32, 16)
    assert header.vk_format == ntex.VK_FORMAT_BC7_SRGB
    assert len(mips) >= 3
    assert _psnr(mips[0], img) > 28.0
    # no-overwrite semantics (make-ntex --overwrite parity)
    assert main(["--silent", str(src)]) == 0  # skips silently


def test_non_multiple_of_4_dimensions():
    img = _test_image(33, 18)
    blocks = native.bc7_encode_mode6(img)
    assert blocks.size == ((33 + 3) // 4) * ((18 + 3) // 4) * 16
