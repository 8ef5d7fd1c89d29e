"""Dump the lowered frame-function StableHLO for determinism diffing."""
import sys

from tools.compile_probe import *  # noqa: F401,F403 — reuse probe()


def dump(path):
    import time

    import renderer_tpu as rt
    from apps import sandbox as sb_mod
    from renderer_tpu.scene import draw_stream

    sb = sb_mod.Sandbox(with_smol_ame=True)
    config = rt.RenderConfig(width=256, height=128, msaa_samples=1,
                             pair_capacity=1 << 14).validate()
    renderer = rt.Renderer(sb.registry, config, overflow_policy="off")
    scene = sb.build_scene(0.0)
    fv = draw_stream.frame_view(scene)
    gs, geom_dev = renderer._geometry(scene, fv.order, fv.geom_key)
    frame = renderer._frame_arrays(scene, fv, gs)
    mats = renderer._materials()
    lowered = renderer._frame_fn.lower(
        geom_dev, frame, mats, config=config, skin_start=gs.skin_start,
        has_masked=gs.num_masked_tris > 0,
        has_blended=gs.num_tris > gs.num_opaque_tris + gs.num_masked_tris,
    )
    with open(path, "w") as f:
        f.write(lowered.as_text())
    print("wrote", path)


if __name__ == "__main__":
    dump(sys.argv[1])
