"""Spheres-only production timing (the round-4 windowed-epilogue A/B).

Runs the exact bench.py spheres measurement (512^2 depth 8, marginal
chained timing, golden mean printed for eyeballing) without the rest of
the suite. Optional TuneConfig field overrides from the command line:

    python tools/bench_spheres_only.py [field=value ...]

e.g. python tools/bench_spheres_only.py scan_batch=4 proc_batch=8 \
         prefetch_depth=16
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import GOLDENS, build, measure, tunnel_rt  # noqa: E402
from webgpu_raytracer_tpu.ops.tune import DEFAULT_TUNE  # noqa: E402


def main():
    overrides = {}
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        cur = getattr(DEFAULT_TUNE, k)
        if isinstance(cur, bool):
            overrides[k] = v in ("1", "true", "True")
        elif isinstance(cur, int):
            overrides[k] = int(v)
        elif isinstance(cur, str):
            overrides[k] = v
        else:
            overrides[k] = eval(v)  # tuple fields (tail_stages)
    tune = DEFAULT_TUNE._replace(**overrides) if overrides else None

    rt = tunnel_rt()
    _, wt, scene, camera = build("spheres")
    v, m, rpf = measure(wt, scene, camera, 512, 512, 1, 8, 4, rt, tune=tune)
    golden = GOLDENS.get("spheres")
    err = abs(m - golden) / abs(golden) if golden else float("nan")
    print(f"spheres 512^2 d8: {v:.2f} Mrays/s  "
          f"{rpf / max(v, 1e-9) / 1e3:.1f} ms/frame  "
          f"mean_rad {m:.4f} (golden {golden}, err {err:.2%})  "
          f"tune={overrides or 'default'}", flush=True)


if __name__ == "__main__":
    main()
