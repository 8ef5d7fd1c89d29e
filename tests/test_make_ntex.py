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


def test_property_random_blocks():
    """Property test over random 4×4 blocks (flat / gradient / noise /
    extreme): every encoded block must decode (PIL oracle) within a bounded
    error, flat blocks near-exactly, and the two encoders (C++ and numpy)
    must stay within quality parity of each other."""
    rng = np.random.default_rng(41)
    blocks: list = []
    limits: list = []
    # flat blocks at random colors (incl. the 0/255 extremes) — near-exact
    for c in ([0, 0, 0, 255], [255, 255, 255, 255], [255, 0, 255, 0]):
        blocks.append(np.broadcast_to(np.array(c, np.uint8), (4, 4, 4)).copy())
        limits.append(2.5)
    for _ in range(8):
        blocks.append(
            np.broadcast_to(rng.integers(0, 256, 4, dtype=np.uint8), (4, 4, 4)).copy()
        )
        limits.append(2.5)
    # axis gradients — colors on one line, 4-bit indices resolve them well
    g = np.linspace(0, 255, 4, dtype=np.uint8)
    blocks.append(np.stack([np.tile(g, (4, 1))] * 4, -1))
    limits.append(8.0)
    blocks.append(np.stack([np.tile(g[:, None], (1, 4))] * 4, -1))
    limits.append(8.0)
    # uniform noise: mode 6's worst case (one color line per block). The
    # property: the encoder must beat the best CONSTANT-color fit of that
    # block (rmse = per-block channel std).
    for _ in range(16):
        blk = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
        blocks.append(blk)
        const_rmse = float(
            np.sqrt(blk[..., :3].astype(float).var(axis=(0, 1)).mean())
        )
        limits.append(0.97 * const_rmse)
    # low-variance noise around a random base (the common texture case)
    for _ in range(16):
        base = rng.integers(30, 226, 4)
        blocks.append(
            np.clip(base + rng.normal(0, 10, (4, 4, 4)), 0, 255).astype(np.uint8)
        )
        limits.append(12.0)

    img = np.concatenate([b.reshape(1, 4, 4, 4) for b in blocks], 0)
    n = img.shape[0]
    sheet = img.transpose(1, 0, 2, 3).reshape(4, n * 4, 4)  # blocks side by side

    for use_native in (True, False):
        lib, failed = native._lib, native._load_failed
        try:
            if not use_native:
                native._lib, native._load_failed = None, True
            enc = native.bc7_encode_mode6(sheet)
        finally:
            native._lib, native._load_failed = lib, failed
        dec = ntex._decode_bc7(enc.tobytes(), n * 4, 4)
        for i, (blk, limit) in enumerate(zip(blocks, limits)):
            got = dec[:, i * 4 : (i + 1) * 4]
            rmse = np.sqrt(
                ((got[..., :3].astype(float) - blk[..., :3].astype(float)) ** 2).mean()
            )
            assert rmse <= limit, (
                f"block {i} ({'native' if use_native else 'numpy'}): rmse "
                f"{rmse:.1f} > {limit}"
            )


def _psnr_ch(a, b, ch):
    err = (a[..., ch].astype(np.float64) - b[..., ch].astype(np.float64)) ** 2
    return 10 * np.log10(255**2 / max(err.mean(), 1e-9))


def test_multimode_beats_mode6_on_alpha_and_edges():
    """The alpha-aware multi-mode encoder (all 8 modes, csrc/bc7enc.cpp
    bc7_encode — the make-ntex slow-settings analog,
    make-ntex/src/main.rs:231-246) must measurably beat the mode-6-only
    path on exactly the content mode 6 degrades on: sharp-alpha cutouts and
    two-subset color edges. Every block must still decode identically
    through BOTH independent decoders (PIL oracle and the repo's all-mode
    JAX decoder)."""
    if native.load() is None:
        pytest.skip("native library unavailable (numpy fallback is mode-6)")
    from renderer_tpu.materials import bc7_jax

    w = h = 64
    x, y = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    # sharp-alpha cutout over color gradients (the alpha-aware case)
    alpha_tex = np.stack([x, 255 - x, y, np.full_like(x, 255)], -1).astype(np.uint8)
    alpha_tex[..., 3] = np.where(((x // 16 + y // 16) % 2) > 0, 255,
                                 (y * 0.3)).astype(np.uint8)
    # opaque diagonal edge between two gradients (the 2-subset case)
    rng = np.random.default_rng(3)
    edge_tex = np.zeros((h, w, 4), np.uint8)
    edge_tex[..., 3] = 255
    d = (x + y) > 255
    edge_tex[..., 0] = np.where(d, x, 30).astype(np.uint8)
    edge_tex[..., 1] = np.where(d, 40, y).astype(np.uint8)
    edge_tex[..., 2] = np.where(d, 200, 90).astype(np.uint8)
    edge_tex[..., :3] = np.clip(
        edge_tex[..., :3].astype(int) + rng.normal(0, 5, (h, w, 3)).astype(int),
        0, 255).astype(np.uint8)

    table = {}
    for name, img in (("alpha", alpha_tex), ("edges", edge_tex)):
        for enc_name, enc in (("mode6", native.bc7_encode_mode6),
                              ("multi", native.bc7_encode)):
            blocks = enc(img)
            dec = ntex._decode_bc7(blocks.tobytes(), w, h)
            # both independent decoders agree bit-exactly on every block
            tex = bc7_jax.decode_blocks_np(
                np.frombuffer(blocks.tobytes(), np.uint8).reshape(-1, 16))
            rgba = np.stack([(tex >> s) & 0xFF for s in (0, 8, 16, 24)],
                            -1).astype(np.uint8)
            jx = rgba.reshape(h // 4, w // 4, 4, 4, 4).transpose(
                0, 2, 1, 3, 4).reshape(h, w, 4)
            np.testing.assert_array_equal(jx, dec)
            table[(name, enc_name)] = (
                _psnr_ch(dec, img, slice(0, 3)), _psnr_ch(dec, img, slice(3, 4)))
    for k, (rgb, a) in sorted(table.items()):
        print(f"{k}: rgb {rgb:.2f} dB, alpha {a:.2f} dB")
    # measured: alpha-tex rgb 37.4 -> 42.9 (modes 7/3/5), edge-tex 37.5 ->
    # 40.0 (modes 1/3); require >= 2 dB to leave slack for compiler
    # differences
    assert table[("alpha", "multi")][0] > table[("alpha", "mode6")][0] + 2.0
    assert table[("edges", "multi")][0] > table[("edges", "mode6")][0] + 2.0
    # alpha channel quality must not regress materially (selection minimizes
    # TOTAL RGBA error, so a small alpha trade for a larger rgb win is the
    # intended behavior; measured -1.04 dB alpha for +1.0 dB rgb)
    assert table[("alpha", "multi")][1] > table[("alpha", "mode6")][1] - 1.5


def test_multimode_property_random_blocks():
    """The multi-mode encoder on the same random-block corpus as the
    mode-6 property test: every block decodes within the same bounds
    (selection by reconstruction error can only improve on mode 6)."""
    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(41)
    blocks = [np.broadcast_to(np.array(c, np.uint8), (4, 4, 4)).copy()
              for c in ([0, 0, 0, 255], [255, 255, 255, 255], [255, 0, 255, 0])]
    for _ in range(8):
        blocks.append(np.clip(
            rng.integers(0, 256, (4, 4, 4)), 0, 255).astype(np.uint8))
    n = len(blocks)
    sheet = np.concatenate([b.reshape(1, 4, 4, 4) for b in blocks], 0)
    sheet = sheet.transpose(1, 0, 2, 3).reshape(4, n * 4, 4)
    enc6 = native.bc7_encode_mode6(sheet)
    encm = native.bc7_encode(sheet)
    dec6 = ntex._decode_bc7(enc6.tobytes(), n * 4, 4).astype(np.float64)
    decm = ntex._decode_bc7(encm.tobytes(), n * 4, 4).astype(np.float64)
    ref = sheet.astype(np.float64)
    # per-block RGBA squared error: multi <= mode6 everywhere (selection
    # keeps mode 6 when nothing beats it)
    for i in range(n):
        sl = (slice(None), slice(i * 4, (i + 1) * 4))
        e6 = ((dec6[sl] - ref[sl]) ** 2).sum()
        em = ((decm[sl] - ref[sl]) ** 2).sum()
        assert em <= e6 + 1e-6, f"block {i}: multi {em} worse than mode6 {e6}"


def _mode_histogram(blocks: np.ndarray) -> dict:
    """Mode id per block (lowest set bit of byte 0, the BC7 mode prefix)."""
    b0 = np.frombuffer(blocks.tobytes(), np.uint8).reshape(-1, 16)[:, 0]
    out: dict = {}
    for v in b0:
        m = 0
        while m < 8 and not (v >> m) & 1:
            m += 1
        out[m] = out.get(m, 0) + 1
    return out


def _decoders_agree(blocks: np.ndarray, w: int, h: int) -> np.ndarray:
    """Decode through BOTH independent decoders (PIL oracle and the repo's
    all-mode JAX decoder), assert bit-exact agreement, return the image."""
    from renderer_tpu.materials import bc7_jax

    dec = ntex._decode_bc7(blocks.tobytes(), w, h)
    tex = bc7_jax.decode_blocks_np(
        np.frombuffer(blocks.tobytes(), np.uint8).reshape(-1, 16))
    rgba = np.stack([(tex >> s) & 0xFF for s in (0, 8, 16, 24)],
                    -1).astype(np.uint8)
    jx = rgba.reshape(h // 4, w // 4, 4, 4, 4).transpose(
        0, 2, 1, 3, 4).reshape(h, w, 4)
    np.testing.assert_array_equal(jx, dec)
    return dec


def test_all8_modes_three_cluster_and_precision_content():
    """The all-8-mode extension (csrc/bc7enc.cpp encode_block_multi — the
    full intel_tex mode-coverage analog, make-ntex/src/main.rs:231-246):
    3-subset modes 0/2 must rescue three-color-cluster blocks that NO single
    color line fits (mode 6 collapses them, measured 15.5 dB), and mode 3's
    7-bit endpoints must beat mode 1's 6-bit on smooth two-region content.
    Every emitted block must decode identically through both independent
    decoders."""
    if native.load() is None:
        pytest.skip("native library unavailable (numpy fallback is mode-6)")
    rng = np.random.default_rng(5)
    w = h = 64
    x, y = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))

    # three color clusters interleaved at sub-block scale: not representable
    # by one line (mode 6) or two subsets; needs modes 0/2
    c3 = np.zeros((h, w, 4), np.uint8)
    c3[..., 3] = 255
    region = (x // 8 + 2 * (y // 8)).astype(int) % 3
    pal = np.array([[220, 40, 30], [30, 200, 60], [40, 60, 230]])
    c3[..., :3] = np.clip(
        pal[region] + rng.normal(0, 6, (h, w, 3)).astype(int), 0, 255)

    dec6 = ntex._decode_bc7(native.bc7_encode_mode6(c3).tobytes(), w, h)
    blocks = native.bc7_encode(c3)
    decm = _decoders_agree(blocks, w, h)
    hist = _mode_histogram(blocks)
    p6, pm = _psnr(dec6, c3), _psnr(decm, c3)
    # measured: 15.5 -> 37.2 dB, modes {0: 9, 1: 34, 2: 90, 3: 123}
    assert pm > p6 + 10.0, f"3-cluster: multi {pm:.1f} vs mode6 {p6:.1f}"
    assert (hist.get(0, 0) + hist.get(2, 0)) > 0, (
        f"3-subset modes unused on 3-cluster content: {hist}")

    # smooth two-gradient split: each subset is a gentle ramp — 2-bit
    # indices suffice but 6-bit endpoints band; mode 3 should dominate
    sm = np.zeros((h, w, 4), np.uint8)
    sm[..., 3] = 255
    d = (x + y) > 255
    sm[..., 0] = np.where(d, 100 + x * 0.1, 30 + y * 0.1)
    sm[..., 1] = np.where(d, 60 + y * 0.05, 150 + x * 0.08)
    sm[..., 2] = np.where(d, 200 - x * 0.1, 90)
    dec6 = ntex._decode_bc7(native.bc7_encode_mode6(sm).tobytes(), w, h)
    blocks = native.bc7_encode(sm)
    decm = _decoders_agree(blocks, w, h)
    hist = _mode_histogram(blocks)
    p6, pm = _psnr(dec6, sm), _psnr(decm, sm)
    # measured: 52.9 -> 58.4 dB, modes {3: 232, 1: 17, 6: 7}
    assert pm > p6 + 3.0, f"smooth-2grad: multi {pm:.1f} vs mode6 {p6:.1f}"
    assert hist.get(3, 0) > 0, f"mode 3 unused on smooth 2-region: {hist}"


def test_mode45_channel_rotation():
    """Modes 4/5 channel rotations (csrc/bc7enc.cpp encode_block_multi rot
    loop): on a block whose GREEN channel carries sharp detail while alpha
    is near-constant, rotation 2 trades the dedicated scalar plane to G —
    the emitted blocks must actually use a nonzero rotation and beat the
    no-rotation mode-6 encode, and still decode identically through both
    decoders."""
    if native.load() is None:
        pytest.skip("native library unavailable")
    w = h = 64
    x, y = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 0] = x
    img[..., 1] = np.where(((x // 4 + y // 4) % 2) > 0, 240, 20)  # sharp G
    img[..., 2] = (y * 0.5).astype(np.uint8)
    img[..., 3] = 200  # constant but non-opaque: the alpha-mode path
    dec6 = ntex._decode_bc7(native.bc7_encode_mode6(img).tobytes(), w, h)
    blocks = native.bc7_encode(img)
    decm = _decoders_agree(blocks, w, h)
    p6, pm = _psnr(dec6, img), _psnr(decm, img)
    # measured: 39.9 -> 45.9 dB, all mode 5
    assert pm > p6 + 3.0, f"rotated-G: multi {pm:.1f} vs mode6 {p6:.1f}"
    raw = np.frombuffer(blocks.tobytes(), np.uint8).reshape(-1, 16)
    rots = []
    for b in raw:
        v = int.from_bytes(b.tobytes(), "little")
        m = 0
        while not (v >> m) & 1:
            m += 1
        if m in (4, 5):
            rots.append((v >> (m + 1)) & 3)
    assert rots and any(r != 0 for r in rots), (
        "no mode-4/5 block used a nonzero rotation")
    # alpha must survive the rotation round-trip (it rides a COLOR line now)
    aerr = np.abs(decm[..., 3].astype(int) - 200)
    assert aerr.max() <= 8, f"alpha error {aerr.max()} after rotation"


def test_non_multiple_of_4_dimensions():
    img = _test_image(33, 18)
    blocks = native.bc7_encode_mode6(img)
    assert blocks.size == ((33 + 3) // 4) * ((18 + 3) // 4) * 16
