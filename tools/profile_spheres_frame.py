"""Op-level trace of one spheres frame (real TPU): where do 742 ms go?

Captures a jax.profiler trace of one full trace_pixels_dense frame at
512^2 d8 under the given TuneConfig and prints the top ops by self time
from the trace protobuf (no TensorBoard needed).

Run: python tools/profile_spheres_frame.py [scan|jobs]
"""
import glob
import gzip
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, tunnel_rt  # noqa: E402
from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense  # noqa: E402
from webgpu_raytracer_tpu.ops.tune import TuneConfig  # noqa: E402


def top_ops(log_dir, n=30):
    """Parse trace.xplane.pb via tensorflow's xplane proto if available,
    else fall back to the .json.gz trace-viewer export."""
    files = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files under", log_dir)
        return
    import json

    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    evs = trace.get("traceEvents", [])
    # device-side complete events: pid/tid vary; aggregate by name
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in evs:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            tot[name] += e["dur"]
            cnt[name] += 1
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    print(f"{'us total':>12} {'calls':>6}  name")
    for name, us in items[:n]:
        print(f"{us:12.0f} {cnt[name]:6d}  {name[:110]}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "jobs"
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tune = TuneConfig(narrow="jobs") if mode == "jobs" else TuneConfig()
    tunnel_rt()
    world, wt, scene, camera = build("spheres")

    fn = jax.jit(lambda wt, tex, cam: trace_pixels_dense(
        wt, tex, cam, jnp.int32(1), jnp.zeros(2, jnp.float32),
        512, 512, 1, depth, tune=tune)[0].mean())
    np.asarray(fn(wt, scene.textures, camera))
    log_dir = f"/tmp/wrt_trace_{mode}"
    with jax.profiler.trace(log_dir):
        for _ in range(2):
            out = fn(wt, scene.textures, camera)
        np.asarray(out)
    top_ops(log_dir)


if __name__ == "__main__":
    main()
