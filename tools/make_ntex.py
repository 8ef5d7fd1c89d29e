#!/usr/bin/env python3
"""make_ntex — offline texture compiler: images → BC7 .ntex containers.

Parity: the reference's make-ntex CLI (reference: make-ntex/src/main.rs:47-95):
full mip chain (Lanczos for color, bilinear for non-color data,
main.rs:150-156,201-209), BC7 compression (ours: native C++ alpha-aware
multi-mode encoder — all 8 BC7 modes, selected per block by reconstruction
error, csrc/bc7enc.cpp; the reference uses intel_tex at slow settings), 1024-byte-header ntex output.

Usage: python -m tools.make_ntex [--overwrite] [--silent]
         [--assume-color | --assume-linear] FILE [FILE...]
"""

from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path

import numpy as np

from renderer_tpu.assets import ntex as ntex_mod
from renderer_tpu.tools import native


def build_mips(rgba: np.ndarray, color: bool) -> list[np.ndarray]:
    """Full mip chain: Lanczos for color data, bilinear (triangle) for
    non-color data (make-ntex/src/main.rs:150-156)."""
    from PIL import Image

    resample = Image.LANCZOS if color else Image.BILINEAR
    mips = [rgba]
    img = Image.fromarray(rgba)
    w, h = rgba.shape[1], rgba.shape[0]
    while w > 4 and h > 4:  # BC7 blocks are 4x4; stop like the reference
        w //= 2
        h //= 2
        mips.append(np.asarray(img.resize((w, h), resample)))
    return mips


def _assemble_ntex(rgba: np.ndarray, mips_blocks: list[bytes], srgb: bool) -> bytes:
    fmt = ntex_mod.VK_FORMAT_BC7_SRGB if srgb else ntex_mod.VK_FORMAT_BC7_UNORM
    header = bytearray(1024)
    header[: len(ntex_mod.MAGIC)] = ntex_mod.MAGIC
    struct.pack_into(
        "<8I", header, 992,
        rgba.shape[1], rgba.shape[0], 1, len(mips_blocks), fmt, 4, 4, 16,
    )
    return bytes(header) + b"".join(mips_blocks)


def encode_ntex(rgba: np.ndarray, srgb: bool, pool=None) -> bytes:
    """Encode one image (optionally fanning the per-mip BC7 encodes out on an
    executor — the reference runs rayon over files×mips,
    make-ntex/src/main.rs:76-88,198-210; the native encoder releases the GIL
    so threads scale)."""
    mips = build_mips(np.ascontiguousarray(rgba, np.uint8), color=srgb)
    if pool is None:
        blocks = [native.bc7_encode(m).tobytes() for m in mips]
    else:
        blocks = [
            f.result().tobytes()
            for f in [pool.submit(native.bc7_encode, m) for m in mips]
        ]
    return _assemble_ntex(rgba, blocks, srgb)


def is_color_image(path: Path, assume_color: bool, assume_linear: bool) -> bool:
    if assume_color:
        return True
    if assume_linear:
        return False
    # heuristic parity with make-ntex: name-based guess, default color
    name = path.stem.lower()
    return not any(k in name for k in ("normal", "rough", "metal", "occl", "_n", "_rm"))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="+", type=Path)
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--silent", action="store_true")
    group = ap.add_mutually_exclusive_group()
    group.add_argument("--assume-color", action="store_true")
    group.add_argument("--assume-linear", action="store_true")
    args = ap.parse_args(argv)

    import os
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    todo = []
    for path in args.files:
        out = path.with_suffix(".ntex")
        if out.exists() and not args.overwrite:
            if not args.silent:
                print(f"skip {out} (exists; use --overwrite)", file=sys.stderr)
            continue
        todo.append((path, out))

    # parallel over files AND mips (make-ntex/src/main.rs:76-88,198-210):
    # one flat pool; per-file tasks decode + build mips, the per-mip BC7
    # encodes fan out on a second pool so a lone huge file still uses every
    # core. PIL decode/resize and the native encoder all release the GIL.
    nproc = os.cpu_count() or 4
    with ThreadPoolExecutor(nproc) as files_pool, \
            ThreadPoolExecutor(nproc) as mips_pool:

        def process(path: Path, out: Path) -> str:
            rgba = np.asarray(Image.open(path).convert("RGBA"))
            srgb = is_color_image(path, args.assume_color, args.assume_linear)
            out.write_bytes(encode_ntex(rgba, srgb, pool=mips_pool))
            kind = "sRGB" if srgb else "linear"
            return f"wrote {out} ({rgba.shape[1]}x{rgba.shape[0]}, BC7 {kind})"

        for f in [files_pool.submit(process, p, o) for p, o in todo]:
            msg = f.result()
            if not args.silent:
                print(msg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
