"""Compile-time bisect: AOT-compile the frame function at several configs."""
import sys
import time

import numpy as np

import renderer_tpu as rt
from apps import sandbox as sb_mod
from renderer_tpu.scene import draw_stream


def probe(width, height, msaa, pair_cap, tag):
    t_all = time.time()
    sb = sb_mod.Sandbox(with_smol_ame=True)
    config = rt.RenderConfig(width=width, height=height, msaa_samples=msaa,
                             pair_capacity=pair_cap).validate()
    renderer = rt.Renderer(sb.registry, config, overflow_policy="off")
    scene = sb.build_scene(0.0)
    fv = draw_stream.frame_view(scene)
    gs, geom_dev = renderer._geometry(scene, fv.order, fv.geom_key)
    frame = renderer._frame_arrays(scene, fv, gs)
    mats = renderer._materials()
    t0 = time.time()
    lowered = renderer._frame_fn.lower(
        geom_dev, frame, mats, config=config, skin_start=gs.skin_start,
        has_masked=gs.num_masked_tris > 0,
        has_blended=gs.num_tris > gs.num_opaque_tris + gs.num_masked_tris,
        joint_cap=renderer._joint_cap(scene),
    )
    t1 = time.time()
    print(f"[{tag}] trace+lower {t1-t0:.1f}s", flush=True)
    compiled = lowered.compile()
    t2 = time.time()
    print(f"[{tag}] XLA compile {t2-t1:.1f}s (setup {t0-t_all:.1f}s)", flush=True)
    return compiled


if __name__ == "__main__":
    which = sys.argv[1]
    if which == "a":
        probe(1920, 1080, 1, 1 << 18, "msaa1-1080p-cap18")
    elif which == "b":
        probe(1920, 1080, 4, 1 << 18, "msaa4-1080p-cap18")
    elif which == "c":
        probe(1920, 1080, 4, 1 << 21, "msaa4-1080p-cap21")
    elif which == "d":
        probe(1280, 720, 4, 1 << 18, "msaa4-720p-cap18")

def probe_tiny(tag):
    """Small graph for cache-key debugging."""
    probe(256, 128, 1, 1 << 14, tag)
