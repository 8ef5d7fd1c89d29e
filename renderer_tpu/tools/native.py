"""ctypes loader for the native C++ library (csrc/), with numpy fallbacks.

The reference's offline texture compressor uses the native intel_tex BC7
encoder (make-ntex/src/main.rs:231-246); our native half lives in
csrc/bc7enc.cpp, built lazily with `make` on first use. Every native entry
point has a pure-numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "librenderer_native.so"
_lib = None
_load_failed = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_f32p = ctypes.POINTER(ctypes.c_float)
_f64p = ctypes.POINTER(ctypes.c_double)


class _AnimProloguePack(ctypes.Structure):
    """Mirror of csrc/anim_pose.cpp AnimProloguePack: every member is 8
    bytes (int64 or pointer), so both sides agree on the layout with no
    padding. Filled once per compiled prologue; the per-frame call passes
    only (pack*, query_times*, root*, mats*, palettes*, block_transforms*)
    — six arguments instead of the ~25 a flat signature would need (ctypes
    argument conversion costs more than the native work itself)."""

    _fields_ = [
        ("n_anims", ctypes.c_int64),
        ("chan_off", _i64p), ("offsets", _i64p),
        ("times", _f64p), ("values", _f32p),
        ("in_tan", _f32p), ("out_tan", _f32p),
        ("slot_of_chan", _i64p), ("path_id", _i32p),
        ("step", _u8p), ("cubic", _u8p),
        ("touch_off", _i64p),
        ("s0", _f32p), ("q0", _f32p), ("t0", _f32p),
        ("touched_idx", _i64p),
        ("n_nodes", ctypes.c_int64), ("static_locals", _f32p),
        ("n_order", ctypes.c_int64), ("order", _i64p), ("parents", _i64p),
        ("n_joints", ctypes.c_int64), ("joint_nodes", _i64p),
        ("ibms", _f32p),
        ("n_skinned", ctypes.c_int64), ("n_static", ctypes.c_int64),
        ("static_idx", _i64p),
    ]


def load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        sources = list(_CSRC.glob("*.cpp"))
        if not _LIB_PATH.exists() or any(
            _LIB_PATH.stat().st_mtime < src.stat().st_mtime for src in sources
        ):
            subprocess.run(["make", "-C", str(_CSRC)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.bc7_encode_mode6.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.bc7_encode_mode6.restype = None
        lib.bc7_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.bc7_encode.restype = None
        lib.atlas_blit_wrap.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.atlas_blit_wrap.restype = None
        lib.draw_prologue.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.draw_prologue.restype = None
        lib.anim_pose.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_double,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ]
        lib.anim_pose.restype = ctypes.c_int
        lib.anim_pose_multi.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ]
        lib.anim_pose_multi.restype = ctypes.c_int
        lib.anim_prologue.argtypes = [
            ctypes.POINTER(_AnimProloguePack),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.anim_prologue.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def atlas_blit_wrap(src: np.ndarray, atlas: np.ndarray, x: int, y: int) -> None:
    """Blit an RGBA8 [h,w,4] image into the u32 atlas at (x, y) with a
    1-texel REPEAT border; numpy fallback when the native lib is absent."""
    h, w = src.shape[:2]
    lib = load()
    if lib is not None:
        src = np.ascontiguousarray(src, np.uint8)
        lib.atlas_blit_wrap(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
            atlas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            atlas.shape[1], x, y,
        )
        return
    packed = np.ascontiguousarray(src, np.uint8).view("<u4")[..., 0]
    bordered = np.pad(packed, ((1, 1), (1, 1)), mode="wrap")
    atlas[y - 1 : y + h + 1, x - 1 : x + w + 1] = bordered


def draw_prologue(keys, transforms, material, joints, skinned, cap):
    """Sort draws by packed key and gather the frame upload arrays in one
    native pass (see csrc/draw_prologue.cpp). Returns (order i32[n],
    sorted_keys u64[n], pdf f32[cap,12], pdi i32[cap,4]) or None when the
    native library is unavailable (caller falls back to numpy)."""
    lib = load()
    if lib is None:
        return None
    n = len(keys)
    order = np.empty(n, np.int32)
    sorted_keys = np.empty(n, np.uint64)
    pdf = np.zeros((cap, 12), np.float32)
    pdi = np.zeros((cap, 4), np.int32)
    if n:
        lib.draw_prologue(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            transforms.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            material.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            joints.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            skinned.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            sorted_keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            pdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pdi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    return order, sorted_keys, pdf, pdi


def make_anim_pose(comp, static_locals, order, parents):
    """Build the native single-animation pose evaluator
    (csrc/anim_pose.cpp): returns `sample(time) -> mats f32 [n, 4, 4]` of
    GLOBAL node poses, or None when the native library is unavailable
    (caller falls back to the vectorized numpy path). The closure marshals
    every ctypes pointer ONCE (pointer construction costs more than the
    native call itself); the input arrays must stay alive and unmodified
    (they are — the compiled-animation/walk caches own them). `sample`
    raises ValueError on a past-the-end timestamp (caller converts to
    AnimationError)."""
    lib = load()
    if lib is None:
        return None
    n_nodes = static_locals.shape[0]

    def ptr(a, ct):
        a = np.ascontiguousarray(a)
        keep.append(a)
        return a.ctypes.data_as(ctypes.POINTER(ct))

    keep: list = []
    fixed = (
        comp.n_channels, ptr(comp.offsets, ctypes.c_int64),
        ptr(comp.times_raw, ctypes.c_double),
        ptr(comp.values, ctypes.c_float),
        ptr(comp.in_tan, ctypes.c_float),
        ptr(comp.out_tan, ctypes.c_float),
        ptr(comp.slot_of_chan, ctypes.c_int64),
        ptr(comp.path_id32, ctypes.c_int32),
        ptr(comp.step_u8, ctypes.c_uint8),
        ptr(comp.cubic_u8, ctypes.c_uint8),
    )
    fixed2 = (
        len(comp.touched), ptr(comp.s0, ctypes.c_float),
        ptr(comp.q0, ctypes.c_float), ptr(comp.t0, ctypes.c_float),
        ptr(comp.touched_arr, ctypes.c_int64),
        n_nodes, ptr(static_locals, ctypes.c_float),
        len(order), ptr(order, ctypes.c_int64),
        ptr(parents, ctypes.c_int64),
    )
    c_float_p = ctypes.POINTER(ctypes.c_float)
    fn = lib.anim_pose

    def sample(time: float) -> np.ndarray:
        mats = np.empty((n_nodes, 4, 4), np.float32)
        rc = fn(*fixed, float(time), *fixed2,
                mats.ctypes.data_as(c_float_p))
        if rc != 0:
            raise ValueError("invalid timestamp")
        return mats

    sample._keepalive = keep  # the arrays behind the raw pointers
    return sample


def _concat_comp_arrays(comps):
    """Concatenate the per-animation _CompiledAnimation arrays in play order
    into the layered-evaluation layout shared by anim_pose_multi and
    anim_prologue. Returns a dict of contiguous numpy arrays."""
    chan_off = np.concatenate(
        [[0], np.cumsum([c.n_channels for c in comps])]
    ).astype(np.int64)
    offs, row_base = [], 0
    for c in comps:
        offs.append(np.asarray(c.offsets[:-1], np.int64) + row_base)
        row_base += int(c.offsets[-1])
    offsets = np.concatenate(offs + [np.asarray([row_base], np.int64)])
    times = (
        np.concatenate([c.times_raw for c in comps]) if row_base
        else np.zeros(0)
    )
    values = (
        np.concatenate([c.values for c in comps]) if row_base
        else np.zeros((0, 4), np.float32)
    )
    in_tan = (
        np.concatenate([c.in_tan for c in comps]) if row_base
        else np.zeros((0, 4), np.float32)
    )
    out_tan = (
        np.concatenate([c.out_tan for c in comps]) if row_base
        else np.zeros((0, 4), np.float32)
    )

    def cat(arrs, dtype, width=None):
        shape = (0,) if width is None else (0, width)
        arrs = [a for a in arrs if len(a)]
        return (
            np.concatenate(arrs).astype(dtype) if arrs
            else np.zeros(shape, dtype)
        )

    return {
        "chan_off": chan_off, "offsets": offsets, "times": times,
        "values": values, "in_tan": in_tan, "out_tan": out_tan,
        "slot_of_chan": cat([c.slot_of_chan for c in comps], np.int64),
        "path_id": cat([c.path_id32 for c in comps], np.int32),
        "step": cat([c.step_u8 for c in comps], np.uint8),
        "cubic": cat([c.cubic_u8 for c in comps], np.uint8),
        "touch_off": np.concatenate(
            [[0], np.cumsum([len(c.touched) for c in comps])]
        ).astype(np.int64),
        "s0": cat([c.s0 for c in comps], np.float32, 3),
        "q0": cat([c.q0 for c in comps], np.float32, 4),
        "t0": cat([c.t0 for c in comps], np.float32, 3),
        "touched_idx": cat([c.touched_arr for c in comps], np.int64),
    }


def make_anim_pose_multi(comps, static_locals, order, parents):
    """Build the native LAYERED pose evaluator for N ≥ 2 playing animations
    (csrc/anim_pose.cpp anim_pose_multi): concatenates the per-animation
    _CompiledAnimation arrays in play order ONCE, returns
    `sample(times: list[float]) -> mats f32 [n, 4, 4]` of GLOBAL node poses,
    or None when the native library is unavailable. `sample` raises
    ValueError(anim_index) on a past-the-end timestamp."""
    lib = load()
    if lib is None:
        return None
    n_anims = len(comps)
    n_nodes = static_locals.shape[0]

    keep: list = []

    def ptr(a, ct):
        a = np.ascontiguousarray(a)
        keep.append(a)
        return a.ctypes.data_as(ctypes.POINTER(ct))

    cc = _concat_comp_arrays(comps)
    fixed = (
        n_anims, ptr(cc["chan_off"], ctypes.c_int64),
        ptr(cc["offsets"], ctypes.c_int64),
        ptr(cc["times"], ctypes.c_double), ptr(cc["values"], ctypes.c_float),
        ptr(cc["in_tan"], ctypes.c_float), ptr(cc["out_tan"], ctypes.c_float),
        ptr(cc["slot_of_chan"], ctypes.c_int64),
        ptr(cc["path_id"], ctypes.c_int32),
        ptr(cc["step"], ctypes.c_uint8), ptr(cc["cubic"], ctypes.c_uint8),
    )
    fixed2 = (
        ptr(cc["touch_off"], ctypes.c_int64), ptr(cc["s0"], ctypes.c_float),
        ptr(cc["q0"], ctypes.c_float), ptr(cc["t0"], ctypes.c_float),
        ptr(cc["touched_idx"], ctypes.c_int64),
        n_nodes, ptr(static_locals, ctypes.c_float),
        len(order), ptr(order, ctypes.c_int64), ptr(parents, ctypes.c_int64),
    )
    qt = np.zeros(n_anims, np.float64)
    keep.append(qt)
    qt_ptr = qt.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    c_float_p = ctypes.POINTER(ctypes.c_float)
    fn = lib.anim_pose_multi

    def sample(query_times) -> np.ndarray:
        qt[:] = query_times
        mats = np.empty((n_nodes, 4, 4), np.float32)
        rc = fn(*fixed, qt_ptr, *fixed2, mats.ctypes.data_as(c_float_p))
        if rc != 0:
            raise ValueError(rc - 1)
        return mats

    sample._keepalive = keep  # the arrays behind the raw pointers
    return sample


def make_anim_prologue(comps, static_locals, order, parents,
                       joint_nodes, ibms, n_skinned, static_idx):
    """Build the ONE-CALL animated-queue frame prologue
    (csrc/anim_pose.cpp anim_prologue): layered pose evaluation for the
    compiled animations, joint palettes written straight into the caller's
    palette storage, and the per-draw transform array in DrawBlock row order
    (n_skinned rows of the un-multiplied root, then root @ static node
    poses — scene_queueing.rs:17-57). Returns
    `sample(times, root, palettes_out) -> transforms f32 [n_skinned +
    n_static, 4, 4]` or None when the native library is unavailable.
    `palettes_out` must be a C-contiguous f32 [n_joints, 4, 4] view (e.g. a
    Scene.joint_palette slice); the returned transforms array is a REUSED
    buffer — valid until the next call (Scene.queue_block copies). Raises
    ValueError(anim_index) on a past-the-end timestamp."""
    lib = load()
    if lib is None:
        return None
    n_anims = len(comps)
    n_nodes = static_locals.shape[0]

    keep: list = []

    def arr(a, dtype):
        a = np.ascontiguousarray(a, dtype)
        keep.append(a)
        return a

    def ptr(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    cc = {k: arr(v, v.dtype) for k, v in _concat_comp_arrays(comps).items()}
    joint_nodes = arr(joint_nodes, np.int64)
    ibms = arr(ibms, np.float32)
    static_idx = arr(static_idx, np.int64)
    static_locals = arr(static_locals, np.float32)
    order = arr(order, np.int64)
    parents = arr(parents, np.int64)

    pack = _AnimProloguePack(
        n_anims=n_anims,
        chan_off=ptr(cc["chan_off"], ctypes.c_int64),
        offsets=ptr(cc["offsets"], ctypes.c_int64),
        times=ptr(cc["times"], ctypes.c_double),
        values=ptr(cc["values"], ctypes.c_float),
        in_tan=ptr(cc["in_tan"], ctypes.c_float),
        out_tan=ptr(cc["out_tan"], ctypes.c_float),
        slot_of_chan=ptr(cc["slot_of_chan"], ctypes.c_int64),
        path_id=ptr(cc["path_id"], ctypes.c_int32),
        step=ptr(cc["step"], ctypes.c_uint8),
        cubic=ptr(cc["cubic"], ctypes.c_uint8),
        touch_off=ptr(cc["touch_off"], ctypes.c_int64),
        s0=ptr(cc["s0"], ctypes.c_float),
        q0=ptr(cc["q0"], ctypes.c_float),
        t0=ptr(cc["t0"], ctypes.c_float),
        touched_idx=ptr(cc["touched_idx"], ctypes.c_int64),
        n_nodes=n_nodes,
        static_locals=ptr(static_locals, ctypes.c_float),
        n_order=len(order),
        order=ptr(order, ctypes.c_int64),
        parents=ptr(parents, ctypes.c_int64),
        n_joints=len(joint_nodes),
        joint_nodes=ptr(joint_nodes, ctypes.c_int64),
        ibms=ptr(ibms, ctypes.c_float),
        n_skinned=int(n_skinned),
        n_static=len(static_idx),
        static_idx=ptr(static_idx, ctypes.c_int64),
    )
    pack_ptr = ctypes.byref(pack)
    qt = np.zeros(n_anims, np.float64)
    root = np.zeros((4, 4), np.float32)
    mats = np.empty((n_nodes, 4, 4), np.float32)
    transforms = np.empty((int(n_skinned) + len(static_idx), 4, 4),
                          np.float32)
    qt_ptr = qt.ctypes.data_as(_f64p)
    root_ptr = root.ctypes.data_as(_f32p)
    mats_ptr = mats.ctypes.data_as(_f32p)
    bt_ptr = transforms.ctypes.data_as(_f32p)
    n_joints = len(joint_nodes)
    fn = lib.anim_prologue

    def sample(query_times, root_transform, palettes_out) -> np.ndarray:
        qt[:] = query_times
        root[:] = root_transform
        assert palettes_out.flags.c_contiguous and \
            palettes_out.dtype == np.float32 and \
            palettes_out.shape == (n_joints, 4, 4)
        rc = fn(pack_ptr, qt_ptr, root_ptr, mats_ptr,
                palettes_out.ctypes.data_as(_f32p), bt_ptr)
        if rc != 0:
            raise ValueError(rc - 1)
        return transforms

    sample._keepalive = (keep, pack)  # the arrays behind the raw pointers
    sample.node_mats = mats  # last call's global node poses (reused buffer)
    return sample


BC7_WEIGHTS4 = np.array(
    [0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64], np.int32
)


def bc7_encode(rgba: np.ndarray) -> np.ndarray:
    """Alpha-aware all-8-mode BC7 encode: [h, w, 4] u8 → blocks
    (u8 [n_blocks*16]). Per block the native encoder keeps the lowest-error
    of the tried modes — opaque blocks: 6 / 1 / 3 (2-subset) / 0 / 2
    (3-subset); alpha blocks: 6 / 5 + 4 (×4 channel rotations) / 7 — the
    make-ntex slow-settings analog (make-ntex/src/main.rs:231-246). The
    partition/anchor tables are passed in from materials/bc7_tables.py
    (single table source). Falls back to the numpy mode-6 path when the
    native library is unavailable (valid blocks, lower quality on
    alpha/multi-subset content — csrc/bc7enc.cpp is the production encoder;
    quality of both is floored by tests/test_make_ntex.py). The fallback is
    LOUD: encoded bytes are environment-dependent (unlike the hot host-path
    natives, whose numpy twins are bit-compatible test oracles — the
    encoder is an offline tool whose correctness oracle is the two
    independent decoders), so a build failure must never silently degrade
    asset quality."""
    rgba = np.ascontiguousarray(rgba, np.uint8)
    h, w = rgba.shape[:2]
    bw, bh = (w + 3) // 4, (h + 3) // 4
    out = np.zeros(bw * bh * 16, np.uint8)
    lib = load()
    if lib is not None:
        from renderer_tpu.materials import bc7_tables

        u8 = ctypes.POINTER(ctypes.c_uint8)
        tables = [
            np.ascontiguousarray(t, np.uint8) for t in (
                bc7_tables.PARTITION_2, bc7_tables.ANCHOR_2,
                bc7_tables.PARTITION_3, bc7_tables.ANCHOR_3_2,
                bc7_tables.ANCHOR_3_3,
            )
        ]
        lib.bc7_encode(
            rgba.ctypes.data_as(u8), w, h,
            *[t.ctypes.data_as(u8) for t in tables],
            out.ctypes.data_as(u8),
        )
        return out
    global _warned_mode6_fallback
    if not _warned_mode6_fallback:
        _warned_mode6_fallback = True
        import sys

        print(
            "# native bc7enc unavailable (csrc build failed?) — falling "
            "back to the numpy MODE-6-ONLY encoder: output is valid BC7 "
            "but lower quality on alpha/multi-subset content",
            file=sys.stderr, flush=True,
        )
    return _bc7_encode_mode6_numpy(rgba, out)


_warned_mode6_fallback = False


def bc7_encode_mode6(rgba: np.ndarray) -> np.ndarray:
    """Encode [h, w, 4] u8 → BC7 mode-6 blocks (u8 [n_blocks*16])."""
    rgba = np.ascontiguousarray(rgba, np.uint8)
    h, w = rgba.shape[:2]
    bw, bh = (w + 3) // 4, (h + 3) // 4
    out = np.zeros(bw * bh * 16, np.uint8)
    lib = load()
    if lib is not None:
        lib.bc7_encode_mode6(
            rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out
    return _bc7_encode_mode6_numpy(rgba, out)


def _bc7_encode_mode6_numpy(rgba: np.ndarray, out: np.ndarray) -> np.ndarray:
    """Vectorized numpy fallback (same algorithm, coarser p-bit search)."""
    h, w = rgba.shape[:2]
    bw, bh = (w + 3) // 4, (h + 3) // 4
    # pad to block multiple with edge clamp
    padded = np.pad(rgba, ((0, bh * 4 - h), (0, bw * 4 - w), (0, 0)), mode="edge")
    blocks = (
        padded.reshape(bh, 4, bw, 4, 4).transpose(0, 2, 1, 3, 4).reshape(-1, 16, 4)
    ).astype(np.float32)  # [N,16,4]

    mean = blocks.mean(axis=1, keepdims=True)
    d = blocks - mean
    cov = np.einsum("nia,nib->nab", d, d)
    axis = np.ones((blocks.shape[0], 4), np.float32)
    for _ in range(8):
        axis = np.einsum("nab,nb->na", cov, axis)
        axis /= np.maximum(np.linalg.norm(axis, axis=1, keepdims=True), 1e-9)
    t = np.einsum("nia,na->ni", d, axis)
    e0 = np.clip(mean[:, 0] + t.min(axis=1, keepdims=True).transpose(0, 1) * axis, 0, 255)
    e1 = np.clip(mean[:, 0] + t.max(axis=1, keepdims=True).transpose(0, 1) * axis, 0, 255)

    def quant(e):
        v = np.rint(e).astype(np.int32)
        p = ((v & 1).sum(axis=1) >= 2).astype(np.int32)  # majority LSB
        q = np.clip((v - p[:, None]) >> 1, 0, 127)
        return q, p, q * 2 + p[:, None]

    q0, p0, r0 = quant(e0)
    q1, p1, r1 = quant(e1)

    # indices: nearest of the 16 interpolated colors
    wts = BC7_WEIGHTS4[None, :, None].astype(np.int32)
    palette = (r0[:, None, :] * (64 - wts) + r1[:, None, :] * wts + 32) >> 6  # [N,16,4]
    dist = ((blocks[:, :, None, :] - palette[:, None, :, :]) ** 2).sum(-1)  # [N,16,16]
    idx = dist.argmin(-1).astype(np.int32)  # [N,16]

    flip = idx[:, 0] >= 8
    q0f = np.where(flip[:, None], q1, q0)
    q1f = np.where(flip[:, None], q0, q1)
    p0f = np.where(flip, p1, p0)
    p1f = np.where(flip, p0, p1)
    idx = np.where(flip[:, None], 15 - idx, idx)

    # pack bits into u128 via two u64 halves
    lo = np.zeros(blocks.shape[0], np.uint64)
    hi = np.zeros(blocks.shape[0], np.uint64)

    def put(value, nbits, pos):
        # pos is a python int; numpy shifts by ≥64 are undefined, so split
        # explicitly at the 64-bit boundary.
        nonlocal lo, hi
        v = value.astype(np.uint64)
        if pos < 64:
            lo |= v << np.uint64(pos)
            if pos + nbits > 64:
                hi |= v >> np.uint64(64 - pos)
        else:
            hi |= v << np.uint64(pos - 64)
        return pos + nbits

    pos = 0
    pos = put(np.full_like(lo, 1 << 6, dtype=np.uint64), 7, pos)
    for c in range(4):
        pos = put(q0f[:, c].astype(np.uint64), 7, pos)
        pos = put(q1f[:, c].astype(np.uint64), 7, pos)
    pos = put(p0f.astype(np.uint64), 1, pos)
    pos = put(p1f.astype(np.uint64), 1, pos)
    pos = put(idx[:, 0].astype(np.uint64), 3, pos)
    for i in range(1, 16):
        pos = put(idx[:, i].astype(np.uint64), 4, pos)
    assert pos == 128

    packed = np.empty((blocks.shape[0], 2), np.uint64)
    packed[:, 0] = lo
    packed[:, 1] = hi
    out[:] = packed.view(np.uint8).reshape(-1)
    return out
