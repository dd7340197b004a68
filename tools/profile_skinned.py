"""Phase breakdown of the skinned-refit animation loop on the real TPU.

The bench's anim_pass (bench.py config 4) overlaps the native refit with
the device frame, so the native C++ cost is hidden; what remains per frame
is (a) build_world_tris (host numpy), (b) the packed upload (device
transfers through the tunnel), (c) accumulation reset + render dispatch,
(d) the device frame itself. This tool times each phase separately to
attribute the gap to the >= 45 fps bar.

Run: python tools/profile_skinned.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import tunnel_rt  # noqa: E402


def main():
    from tests.glb_fixture import skinned_strip_glb
    from webgpu_raytracer_tpu.config import RenderConfig
    from webgpu_raytracer_tpu.render.renderer import Renderer
    from webgpu_raytracer_tpu.render.worldtris import build_world_tris

    rt = tunnel_rt()
    print(f"tunnel rt: {rt*1e3:.2f} ms")

    r = Renderer("viewer", glb_data=skinned_strip_glb(),
                 config=RenderConfig(width=512, height=512, max_depth=8,
                                     shader_spp=1))
    r.update_scene(0.0)
    r.render_frame()
    np.asarray(r.accum)

    def phase(name, fn, n=12):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts = np.array(ts[2:]) * 1e3
        print(f"{name:28s} med {np.median(ts):6.2f} ms  "
              f"min {ts.min():6.2f}  max {ts.max():6.2f}")

    # native update (serial, not overlapped)
    t = [0.1]

    def native_update():
        t[0] += 1 / 30.0
        r.bridge.update_async(t[0])
        r.bridge.wait()

    phase("native update (C++)", native_update)
    phase("build_world_tris (numpy)", lambda: build_world_tris(r.world))
    phase("reupload_scene (wt+upload)", lambda: r.reupload_scene())
    phase("render_frame dispatch", lambda: r.render_frame())

    def full_sync_frame():
        r.render_frame()
        np.asarray(r.accum)

    phase("render_frame + sync", full_sync_frame)

    def anim_frame():
        t[0] += 1 / 30.0
        r.bridge.update_async(t[0])
        r.bridge.wait()
        r.reupload_scene()
        r.render_frame()
        np.asarray(r.accum)

    phase("full anim frame (sync)", anim_frame)


if __name__ == "__main__":
    main()
