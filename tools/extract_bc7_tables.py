"""Extract the BC7 spec's partition and anchor-index tables empirically.

The BC7 format (Khronos Data Format spec §"BC7") fixes three constant
tables: the 64 two-subset partition patterns, the 64 three-subset patterns,
and the anchor-index positions whose index fields drop their MSB. Rather
than transcribing them (error-prone), this tool RECOVERS them from Pillow's
reference bcn decoder by constructing probe blocks whose decoded texels
reveal each table entry, validating every assumption loudly:

- PARTITION_2 via mode 1 (black/white subset endpoints, all indices 0:
  the decoded 4x4 IS the partition pattern),
- PARTITION_3 via mode 2 (three distinguishable endpoint levels),
- ANCHOR_* by consistency search: with per-texel index values that decode
  to known interpolation levels, only the TRUE anchor position makes the
  variable-width index bitstream parse to the expected image.

The recovered tables are written as renderer_tpu/materials/bc7_tables.py
(run: python -m tools.extract_bc7_tables [--write]);
tests/test_bc7_decode.py re-runs the extraction and asserts the committed
literals still match, so the generated file can never drift silently.
"""

from __future__ import annotations

import sys

import numpy as np

W2 = [0, 21, 43, 64]
W3 = [0, 9, 18, 27, 37, 46, 55, 64]


def decode_block(block: bytes) -> np.ndarray:
    from PIL import Image

    assert len(block) == 16
    img = Image.frombytes("RGBA", (4, 4), block, "bcn", (7, ""))
    return np.asarray(img).copy()  # [4, 4, 4] u8


def make_block(fields) -> bytes:
    """Assemble a 128-bit block from LSB-first (value, nbits) fields,
    zero-padded to 128."""
    acc = 0
    pos = 0
    for v, n in fields:
        assert 0 <= int(v) < (1 << n), (v, n)
        acc |= int(v) << pos
        pos += n
    assert pos <= 128, pos
    return acc.to_bytes(16, "little")


def _expand(v: int, bits: int) -> int:
    v = v << (8 - bits)
    return v | (v >> bits)


def extract_partition2() -> np.ndarray:
    """Mode 1: subset 0 endpoints black, subset 1 white-ish, indices 0 —
    the decoded block IS the pattern."""
    lo, hi = 0, _expand(63 << 1, 7)  # 6-bit endpoint + shared p-bit 0
    out = np.zeros((64, 16), np.int8)
    for p in range(64):
        f = [(1 << 1, 2), (p, 6)]
        for _chan in range(3):
            f += [(0, 6), (0, 6), (63, 6), (63, 6)]
        block = make_block(f)  # p-bits + indices stay 0
        img = decode_block(block)
        r = img[..., 0].reshape(16)
        levels = set(np.unique(r))
        assert levels <= {lo, hi}, (p, levels, (lo, hi))
        out[p] = (r == hi).astype(np.int8)
        assert out[p, 0] == 0, "texel 0 must be subset 0 by spec"
    return out


def extract_partition3() -> np.ndarray:
    """Mode 2: three endpoint levels, indices 0."""
    lv = [0, _expand(15, 5), _expand(31, 5)]
    out = np.zeros((64, 16), np.int8)
    for p in range(64):
        f = [(1 << 2, 3), (p, 6)]
        for _chan in range(3):
            f += [(0, 5), (0, 5), (15, 5), (15, 5), (31, 5), (31, 5)]
        img = decode_block(make_block(f))
        r = img[..., 0].reshape(16)
        assert set(np.unique(r)) <= set(lv), (p, np.unique(r), lv)
        out[p] = np.select([r == lv[1], r == lv[2]], [1, 2], 0)
        assert out[p, 0] == 0, "texel 0 must be subset 0 by spec"
    return out


def _mode1_block_with_indices(p: int, anchor: int, idx: list[int]) -> bytes:
    """Mode 1 block: both subsets ramp black->white, given per-texel 3-bit
    indices packed assuming `anchor` is subset 1's anchor (2-bit field)."""
    f = [(1 << 1, 2), (p, 6)]
    for _chan in range(3):
        f += [(0, 6), (63, 6), (0, 6), (63, 6)]
    f += [(0, 1), (0, 1)]
    for t in range(16):
        width = 2 if t in (0, anchor) else 3
        assert idx[t] < (1 << width), (t, idx[t])
        f.append((idx[t], width))
    return make_block(f)


def extract_anchor2(part2: np.ndarray) -> np.ndarray:
    """For each partition, the subset-1 texel whose assumed anchor position
    makes the known per-texel indices decode to the expected ramp levels."""
    hi = _expand(63 << 1, 7)
    exp_levels = [(hi * w + 32) >> 6 for w in W3]
    out = np.zeros(64, np.int32)
    for p in range(64):
        idx = [(t % 3) + 1 for t in range(16)]
        idx[0] = 1
        expected = np.array([exp_levels[i] for i in idx], np.int32)
        candidates = [t for t in range(1, 16) if part2[p, t] == 1]
        hits = []
        for a in candidates:
            trial = list(idx)
            trial[a] = min(trial[a], 3)
            img = decode_block(_mode1_block_with_indices(p, a, trial))
            exp = expected.copy()
            exp[a] = exp_levels[trial[a]]
            if (img[..., 0].reshape(16) == exp).all():
                hits.append(a)
        assert len(hits) == 1, (p, hits)
        out[p] = hits[0]
    return out


def _mode2_block_with_indices(p: int, a2: int, a3: int,
                              idx: list[int]) -> bytes:
    f = [(1 << 2, 3), (p, 6)]
    for _chan in range(3):
        f += [(0, 5), (31, 5)] * 3  # every subset ramps black->white
    for t in range(16):
        width = 1 if t in (0, a2, a3) else 2
        assert idx[t] < (1 << width), (t, idx[t])
        f.append((idx[t], width))
    return make_block(f)


def extract_anchor3(part3: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    hi = _expand(31, 5)
    exp_levels = [(hi * w + 32) >> 6 for w in W2]
    a2_out = np.zeros(64, np.int32)
    a3_out = np.zeros(64, np.int32)
    for p in range(64):
        # a varied 2-bit pattern (period 3 vs the field width's period 2)
        # so any bitstream misalignment shifts SOME texel's decoded level;
        # anchors clamp to their 1-bit field with the expectation adjusted
        idx = [(t * 2 + 1) % 4 for t in range(16)]
        idx[0] = 1  # texel 0 is an anchor: 1 fits its 1-bit field
        c2 = [t for t in range(1, 16) if part3[p, t] == 1]
        c3 = [t for t in range(1, 16) if part3[p, t] == 2]
        hits = []
        for a2 in c2:
            for a3 in c3:
                trial = list(idx)
                trial[a2] = min(trial[a2], 1)
                trial[a3] = min(trial[a3], 1)
                img = decode_block(_mode2_block_with_indices(p, a2, a3, trial))
                expected = np.array([exp_levels[i] for i in trial], np.int32)
                if (img[..., 0].reshape(16) == expected).all():
                    hits.append((a2, a3))
        assert len(hits) == 1, (p, hits)
        a2_out[p], a3_out[p] = hits[0]
    return a2_out, a3_out


def extract_all() -> dict[str, np.ndarray]:
    p2 = extract_partition2()
    p3 = extract_partition3()
    a2 = extract_anchor2(p2)
    a3_2, a3_3 = extract_anchor3(p3)
    return {"PARTITION_2": p2, "PARTITION_3": p3, "ANCHOR_2": a2,
            "ANCHOR_3_2": a3_2, "ANCHOR_3_3": a3_3}


def render_module(tables: dict[str, np.ndarray]) -> str:
    lines = [
        '"""BC7 constant tables (partition patterns + anchor indices).',
        "",
        "GENERATED by tools/extract_bc7_tables.py, which recovers the BC7",
        "spec's constants from Pillow's reference bcn decoder with loud",
        "consistency checks; tests/test_bc7_decode.py re-runs the extraction",
        "and asserts these literals still match. Do not edit by hand.",
        '"""',
        "",
        "import numpy as np",
        "",
    ]
    for name, arr in tables.items():
        if arr.ndim == 2:
            rows = ",\n    ".join(
                "[" + ", ".join(str(int(v)) for v in row) + "]" for row in arr
            )
            lines.append(f"{name} = np.array([\n    {rows},\n], np.int32)")
        else:
            vals = ", ".join(str(int(v)) for v in arr)
            lines.append(f"{name} = np.array([{vals}], np.int32)")
        lines.append("")
    return "\n".join(lines)


def main() -> None:
    tables = extract_all()
    for k, v in tables.items():
        print(f"{k}: shape {v.shape}")
    if "--write" in sys.argv:
        from pathlib import Path

        out = (Path(__file__).resolve().parents[1] / "renderer_tpu"
               / "materials" / "bc7_tables.py")
        out.write_text(render_module(tables))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
