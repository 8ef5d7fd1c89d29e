"""Dump the canonicalized module bytes that the persistent-cache key hashes,
then abort (skip the compile). Usage: python -m tools.dump_cachekey_module OUT
[W H MSAA CAP]."""
import sys

out = sys.argv[1]
dims = [int(x) for x in sys.argv[2:]] or [256, 128, 1, 1 << 14]

from jax._src import cache_key

orig = cache_key._hash_computation


class Done(Exception):
    pass


def patched(hash_obj, module, ignore_callbacks):
    b = cache_key._canonicalize_ir(module, ignore_callbacks)
    with open(out, "wb") as f:
        f.write(b)
    print("dumped", len(b), "bytes", flush=True)
    raise Done()


cache_key._hash_computation = patched

import renderer_tpu as rt
from apps import sandbox as sb_mod
from renderer_tpu.scene import draw_stream

sb = sb_mod.Sandbox(with_smol_ame=True)
config = rt.RenderConfig(width=dims[0], height=dims[1], msaa_samples=dims[2],
                         pair_capacity=dims[3]).validate()
renderer = rt.Renderer(sb.registry, config, overflow_policy="off")
scene = sb.build_scene(0.0)
try:
    img = renderer.render_frame_device(scene)
    img.block_until_ready()
except Done:
    print("aborted before compile (as intended)")
except Exception as e:
    if "Done" in type(e).__name__ or "Done" in str(e):
        print("aborted before compile (as intended)")
    else:
        raise
