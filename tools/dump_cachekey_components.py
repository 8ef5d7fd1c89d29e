"""Print every cache-key component hash for the frame function, then abort."""
import hashlib
import sys

from jax._src import cache_key

orig_get = cache_key.get


class Done(Exception):
    pass


def patched_get(module, devices, compile_options, backend,
                compression_algorithm="zstandard",
                ignore_callbacks=cache_key.IgnoreCallbacks.NO):
    big = module.operation.get_asm(binary=True, enable_debug_info=False)
    key = orig_get(module, devices, compile_options, backend,
                   compression_algorithm, ignore_callbacks)
    if len(big) > 500_000:  # the frame function
        canon = cache_key._canonicalize_ir(module, ignore_callbacks)
        print("module_canon_sha:", hashlib.sha256(canon).hexdigest(), flush=True)
        print("devices:", hashlib.sha256(
            str(sorted(getattr(d, 'id', 0) for d in devices)).encode()).hexdigest()[:16],
            repr(devices)[:200], flush=True)
        co = compile_options.SerializeAsString() if hasattr(
            compile_options, 'SerializeAsString') else str(compile_options).encode()
        print("compile_options_sha:", hashlib.sha256(co).hexdigest(), flush=True)
        print("compile_options_repr:", str(compile_options)[:4000], flush=True)
        try:
            print("backend_version:", backend.platform_version, flush=True)
        except Exception as e:
            print("backend_version err", e)
        print("FINAL KEY:", key, flush=True)
        raise Done()
    return key


cache_key.get = patched_get

import renderer_tpu as rt
from apps import sandbox as sb_mod

sb = sb_mod.Sandbox(with_smol_ame=True)
config = rt.RenderConfig(width=1920, height=1080, msaa_samples=4,
                         pair_capacity=1 << 21).validate()
renderer = rt.Renderer(sb.registry, config, overflow_policy="off")
scene = sb.build_scene(0.0)
try:
    img = renderer.render_frame_device(scene)
    img.block_until_ready()
except Done:
    print("aborted before compile")
