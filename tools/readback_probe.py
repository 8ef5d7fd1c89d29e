"""Axon tunnel readback behavior probe: which device→host copies hang?

Usage: python -m tools.readback_probe <n_frames> <what>
  what: last-stats | first-stats | image | stacked-stats
"""
import sys
import time

import numpy as np

import renderer_tpu as rt
from apps import sandbox as sb_mod


def main():
    n = int(sys.argv[1])
    what = sys.argv[2]
    sb, renderer, name = sb_mod.build_bench(for_bench=True)
    scene = sb.build_scene(0.0)

    retain = what != "last-stats-no-retain"
    t0 = time.time()
    stats = []
    img = None
    for i in range(n):
        img = renderer.render_frame_device(sb.build_scene(i / 60.0), debug_mode=0)
        if retain:
            stats.append(renderer.last_stats)
    img.block_until_ready()
    if not retain:
        stats = [renderer.last_stats]
    print(f"rendered {n} frames in {time.time()-t0:.1f}s (incl compile)", flush=True)

    t0 = time.time()
    if what in ("last-stats", "last-stats-no-retain"):
        out = np.asarray(stats[-1])
    elif what == "first-stats":
        out = np.asarray(stats[0])
    elif what == "image":
        out = np.asarray(img)
    elif what == "stacked-stats":
        import jax.numpy as jnp

        out = np.asarray(jnp.max(jnp.stack(stats), axis=0))
    print(f"readback[{what}] {time.time()-t0:.1f}s -> {out.shape} sum={out.sum()}",
          flush=True)


if __name__ == "__main__":
    main()
