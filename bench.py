"""Benchmark: Mrays/sec/chip across the BASELINE configs.

Prints one JSON line per config; the HEADLINE (BASELINE config 2: cornell
512x512 depth 8) is printed LAST in the driver's
{"metric", "value", "unit", "vs_baseline"} contract.
North-star baseline (BASELINE.md): 200 Mrays/sec/chip on TPU v5e.

Methodology (the tunneled "axon" chip makes naive timing dishonest in both
directions):
- Frames are CHAINED in one jitted lax.fori_loop and reduced to a scalar on
  device, so the wall time contains no per-frame dispatch and only one tiny
  host readback; the measured tunnel round-trip is subtracted.
- Ray counts are EXACT: ray_color_dense counts primary + NEE shadow +
  extension lanes actually traced (ops/dense_trace.py), measured for the
  same frame sequence that is timed — no assumed path-decay model.
- Correctness gating is DEFAULT-ON: each config's mean radiance is asserted
  against its TPU-recorded golden value (GOLDENS) and reported as
  "golden_ok" per metric line; any deviation exits nonzero after all lines
  print. `--no-check` opts out; unrecorded goldens emit "golden_mean" for
  recording instead.
"""

from __future__ import annotations

import functools
import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MRAYS = 200.0
REPEATS = 3  # best-of-N: the tunneled chip shows contention noise

# Golden mean radiance per config (recorded from oracle-validated TPU runs;
# MC tolerance ~2%). The gate is DEFAULT-ON: every bench run on real
# hardware doubles as a correctness check (--no-check to opt out; a None
# value emits the measured mean for recording instead of gating).
GOLDENS = {
    "cornell": 0.3040,
    "cornell_1080p": 0.1766,
    "gem": 0.3751,     # TPU-recorded 2026-08-17 (round 3 HEAD baseline run)
    "spheres": 0.0424,
    "textured": 0.2739,
}
GOLDEN_TOL = 0.02

# A gem-like convex OBJ standing in for the reference's bundled diamond.obj
# (an asset we deliberately do not copy): icosahedron, BASELINE config 1.
_PHI = (1 + 5 ** 0.5) / 2
_ICO_V = [(-1, _PHI, 0), (1, _PHI, 0), (-1, -_PHI, 0), (1, -_PHI, 0),
          (0, -1, _PHI), (0, 1, _PHI), (0, -1, -_PHI), (0, 1, -_PHI),
          (_PHI, 0, -1), (_PHI, 0, 1), (-_PHI, 0, -1), (-_PHI, 0, 1)]
_ICO_F = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
          (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
          (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
          (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
GEM_OBJ = "".join(f"v {x} {y} {z}\n" for x, y, z in _ICO_V) + \
    "".join(f"f {a+1} {b+1} {c+1}\n" for a, b, c in _ICO_F)


def tunnel_rt() -> float:
    """Median round-trip of a tiny device->host readback (tunnel latency)."""
    np.asarray(jnp.zeros(()) + 1.0)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(()) + 1.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def build(scene_name, obj_source=None, glb_data=None, width=512, height=512):
    from webgpu_raytracer_tpu.models.native import NativeWorld
    from webgpu_raytracer_tpu.render.resources import build_device_scene
    from webgpu_raytracer_tpu.render.worldtris import build_world_tris
    from webgpu_raytracer_tpu.utils.textures import decode_world_textures

    from webgpu_raytracer_tpu.utils.textures import build_quad_pyramid

    world = NativeWorld(scene_name, obj_source, glb_data)
    world.update_camera(width, height)
    # Decode to the 1024^2 texture array like the Renderer does — without
    # this, textured configs silently bench the 1x1 fast path. Like the
    # Renderer, textured scenes carry the quad-table pyramid: level 0 for
    # bounce-0 samples, the Kronecker-fetch secondary mip for bounces >= 1
    # (utils/textures.SECONDARY_MIP).
    dec = decode_world_textures(world)
    scene = build_device_scene(world, textures=dec)
    if dec is not None:
        from webgpu_raytracer_tpu.utils.textures import device_pyramid

        pyr = device_pyramid(build_quad_pyramid(dec))
        scene = scene._replace(
            textures=pyr[0] if pyr[1] is pyr[0] else pyr)
    wt = build_world_tris(world)
    camera = jnp.asarray(world.camera())
    return world, wt, scene, camera


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "spp", "depth",
                                    "tune"))
def _chained_frames(wt, tex, camera, *, width, height, spp, depth, n,
                    tune=None):
    """n progressive frames chained on device; returns (mean-radiance sum,
    exact total rays traced). `n` is DYNAMIC on purpose: with a static
    bound XLA unrolls the frame loop and the unrolled program runs ~18%
    slower (14.9 vs 12.3 ms/frame, measured) — and a dynamic bound means
    one compile covers every n."""
    from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense

    from webgpu_raytracer_tpu.ops.tune import DEFAULT_TUNE

    def body(i, acc):
        s, rays = acc
        col, r = trace_pixels_dense(
            wt, tex, camera, i + 1, jnp.zeros(2, jnp.float32),
            width, height, spp, depth, with_stats=True,
            tune=tune or DEFAULT_TUNE)
        return s + col.mean(), rays + r

    return jax.lax.fori_loop(
        0, n, body, (jnp.zeros(()), jnp.zeros(())))


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "spp", "depth"))
def _chained_frames_gb(wt, tex, camera, *, width, height, spp, depth, n):
    """Like _chained_frames but with the G-buffer-seeded bounce 0
    (render_step(use_gbuffer=True) semantics): rasterize primary visibility,
    seed every sample's first hit from the id channel. Radiance is
    bit-identical to the traced path at lens_radius == 0, so the same
    golden gates both (tests/test_gbuffer_post.py)."""
    from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense
    from webgpu_raytracer_tpu.ops.gbuffer import render_gbuffer

    jitter = jnp.zeros(2, jnp.float32)

    def body(i, acc):
        s, rays = acc
        gb = render_gbuffer(wt, tex, camera, width, height, jitter=jitter)
        col, r = trace_pixels_dense(
            wt, tex, camera, i + 1, jitter, width, height, spp, depth,
            with_stats=True, seed_wt_idx=gb.wt_idx.reshape(-1))
        return s + col.mean(), rays + r + width * height

    return jax.lax.fori_loop(
        0, n, body, (jnp.zeros(()), jnp.zeros(())))


def measure(wt, scene, camera, width, height, spp, depth, n, rt,
            chained=_chained_frames, tune=None):
    """MARGINAL chained timing: time(run(n)) - time(run(n2)) cancels every
    fixed cost — dispatch, readback, and the tunneled chip's (highly
    variable) round-trip latency — so the result is pure device throughput.
    The older absolute-minus-rt method swung 15% with tunnel weather."""
    extra = {"tune": tune} if tune is not None else {}
    run = lambda k: chained(wt, scene.textures, camera, width=width,
                            height=height, spp=spp, depth=depth, n=k,
                            **extra)
    n2 = max(1, n // 4)
    s, rays_n = run(n)   # warm (compile) both shapes
    rays_2 = float(np.asarray(run(n2)[1]))
    rays_total = float(np.asarray(rays_n))
    mean_rad = float(np.asarray(s)) / n
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(run(n2)[0])
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(n)[0])
        tn = time.perf_counter() - t0
        best = min(best, max(tn - t2, 1e-6))
    d_rays = rays_total - rays_2
    return d_rays / best / 1e6, mean_rad, rays_total / n


def emit(metric, value, unit, vs=None, **extra):
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if vs is not None:
        rec["vs_baseline"] = round(vs, 3)
    rec.update(extra)
    print(json.dumps(rec), flush=True)


_golden_failures: list = []


def golden_fields(name, mean_rad, check):
    """Per-config golden gate: {"golden_ok": bool} when gating (default), the
    measured mean for recording when the golden is unrecorded or gating is
    off. A failed gate is also collected so main() can exit nonzero AFTER all
    metric lines print (the driver reads the trailing headline line)."""
    golden = GOLDENS.get(name)
    if golden is None or not check:
        return {"golden_mean": round(mean_rad, 4)}
    err = abs(mean_rad - golden) / abs(golden)
    ok = bool(err < GOLDEN_TOL)
    if not ok:
        _golden_failures.append(
            f"{name}: mean {mean_rad:.4f} deviates {err:.1%} "
            f"from golden {golden}")
    return {"golden_ok": ok}


def soak(argv):
    """BASELINE config 5's operating point, single chip: a long progressive
    1080p accumulation through the PRODUCT Renderer, checkpointed mid-run
    (render/checkpoint.py) and resumed into a FRESH renderer; asserts the
    resumed accumulation is BIT-IDENTICAL to the uninterrupted run and
    reports accumulated spp/sec. `--soak-spp N` overrides the 1024 target
    (use a small N for a smoke pass)."""
    import os
    import tempfile

    from webgpu_raytracer_tpu.config import RenderConfig
    from webgpu_raytracer_tpu.render.checkpoint import (load_checkpoint,
                                                        save_checkpoint)
    from webgpu_raytracer_tpu.render.renderer import Renderer

    target = 1024
    if "--soak-spp" in argv:
        target = int(argv[argv.index("--soak-spp") + 1])
    cfg = RenderConfig(width=1920, height=1080, max_depth=8, shader_spp=1)

    r = Renderer("cornell", config=cfg)
    r.render_frame()
    np.asarray(r.accum)  # warm/compile

    # Uninterrupted reference run (timed).
    r2 = Renderer("cornell", config=cfg)
    t0 = time.perf_counter()
    for _ in range(target):
        r2.render_frame()
    ref = np.asarray(r2.accum)
    wall = time.perf_counter() - t0

    # Interrupted run: checkpoint at half, restore into a fresh renderer.
    half = target // 2
    r3 = Renderer("cornell", config=cfg)
    for _ in range(half):
        r3.render_frame()
    ckpt = os.path.join(tempfile.mkdtemp(prefix="wrt_soak"), "ck")
    save_checkpoint(ckpt, r3)
    r4 = Renderer("cornell", config=cfg)
    assert load_checkpoint(ckpt, r4), "checkpoint restore failed"
    for _ in range(target - half):
        r4.render_frame()
    resumed = np.asarray(r4.accum)
    bitexact = bool((ref == resumed).all())

    emit("soak_1080p_progressive_spp_per_sec", target / wall, "spp/s",
         accumulated_spp=target, wall_s=round(wall, 1),
         bitexact_resume=bitexact)
    return 0 if bitexact else 1


def main(argv):
    check = "--no-check" not in argv  # correctness gate is DEFAULT-ON
    quick = "--quick" in argv
    if "--soak" in argv:
        return soak(argv)
    rt = tunnel_rt()

    # --- config 2 (HEADLINE): cornell 512x512 depth 8 ---
    world, wt, scene, camera = build("cornell")
    n = 8 if quick else 32
    mrays_cornell, mean_rad, rays_pf = measure(
        wt, scene, camera, 512, 512, 1, 8, n, rt)
    headline_golden = golden_fields("cornell", mean_rad, check)

    if not quick:
        # --- cornell at 1080p (the BASELINE north-star resolution) ---
        try:
            world.update_camera(1920, 1080)
            cam_hd = jnp.asarray(world.camera())
            v, m, rpf = measure(wt, scene, cam_hd, 1920, 1080, 1, 8, 8, rt)
            emit("cornell_1080p_d8_mrays_per_sec_per_chip", v, "Mrays/s",
                 spp_per_sec_1080p=round(v * 1e6 / rpf, 2),
                 **golden_fields("cornell_1080p", m, check))
            # A/B: G-buffer-seeded bounce 0 (the reference's rasterizer
            # exists purely to make depth 0 cheap — Rasterizer.wgsl:110-173;
            # delta_vs_traced quantifies whether that pays on TPU).
            vg, mg, rpfg = measure(wt, scene, cam_hd, 1920, 1080, 1, 8, 8,
                                   rt, chained=_chained_frames_gb)
            emit("cornell_1080p_d8_gbuffer_seeded_mrays_per_sec", vg,
                 "Mrays/s",
                 delta_vs_traced=round((rpf / max(v, 1e-9))
                                       / (rpfg / max(vg, 1e-9)) - 1.0, 4),
                 **golden_fields("cornell_1080p", mg, check))
        except Exception as e:
            emit("cornell_1080p_d8_mrays_per_sec_per_chip", -1.0, "Mrays/s",
                 error=str(e)[:120])

        # --- config 1: gem OBJ on the viewer pedestal, 256x256 d5 ---
        _, wt1, sc1, cam1 = build("viewer", obj_source=GEM_OBJ,
                                  width=256, height=256)
        v, m, _ = measure(wt1, sc1, cam1, 256, 256, 1, 5, 32, rt)
        emit("gem_obj_256_d5_mrays_per_sec_per_chip", v, "Mrays/s",
             **golden_fields("gem", m, check))

        # --- large scene: spheres preset (257k tris) via the two-level
        # culled sweep (ops/pallas_dense._run2 + coherence sort) ---
        try:
            _, wts, scs, cams = build("spheres")
            v, m, rpf = measure(wts, scs, cams, 512, 512, 1, 8, 4, rt)
            emit("spheres_257k_512_d8_mrays_per_sec_per_chip", v, "Mrays/s",
                 ms_per_frame=round(rpf / max(v, 1e-9) / 1e3, 1),
                 **golden_fields("spheres", m, check))
        except Exception as e:
            emit("spheres_257k_512_d8_mrays_per_sec_per_chip", -1.0,
                 "Mrays/s", error=str(e)[:120])

        # --- config 3: textured GLB at 1080p d8 (texture-array sampling) ---
        try:
            from tests.glb_fixture import textured_quad_glb

            _, wt3, sc3, cam3 = build("viewer",
                                      glb_data=textured_quad_glb(),
                                      width=1920, height=1080)
            v, m, rpf = measure(wt3, sc3, cam3, 1920, 1080, 1, 8, 8, rt)
            emit("textured_glb_1080p_d8_mrays_per_sec_per_chip", v,
                 "Mrays/s", spp_per_sec_1080p=round(v * 1e6 / rpf, 2),
                 **golden_fields("textured", m, check))
        except Exception as e:  # keep the headline robust
            emit("textured_glb_1080p_d8_mrays_per_sec_per_chip", -1.0,
                 "Mrays/s", error=str(e)[:120])

        # --- config 4: skinned animation, per-frame refit + reset, 512p ---
        # Free the earlier configs' device tables first (the 257k-tri
        # spheres operands + two 1080p working sets): leaving them alive
        # pressured the HBM allocator during this config's per-tick
        # alloc/upload churn — measured 39.6 fps in-bench vs 71-82 fps for
        # the identical loop standalone (round 5).
        import gc

        try:
            del wt1, sc1, cam1
        except NameError:
            pass
        try:
            del wts, scs, cams
        except NameError:
            pass
        try:
            del wt3, sc3, cam3
        except NameError:
            pass
        gc.collect()
        try:
            from tests.glb_fixture import skinned_strip_glb

            from webgpu_raytracer_tpu.render.renderer import Renderer
            from webgpu_raytracer_tpu.config import RenderConfig

            r = Renderer("viewer", glb_data=skinned_strip_glb(),
                         config=RenderConfig(width=512, height=512,
                                             max_depth=8, shader_spp=1))
            r.update_scene(0.0)
            r.render_frame()
            np.asarray(r.accum)  # warm + sync

            # Product-shape animation loop (render/recorder.py:143-159,
            # cli.py --animate): the native refit for frame k+1 runs on the
            # WorldBridge worker thread (C++ releases the GIL) while the
            # device renders frame k — the reference overlaps its WASM
            # worker with GPU frames identically (VideoRecorder.ts:183-227).
            def anim_pass(nf, t_base):
                r.bridge.update_async(t_base)
                for k in range(nf):
                    r.bridge.wait()
                    r.reupload_scene()  # refit upload + accumulation reset
                    if k + 1 < nf:
                        r.bridge.update_async(t_base + (k + 1) / 30.0)
                    r.render_frame()
                # Sync on a device-side scalar, not the 4 MB accumulator:
                # pulling the full buffer through the tunnel costs
                # ~50-150 ms of TUNNEL bandwidth (weather-dependent) per
                # pass and was the dominant, noisiest term of this metric
                # (tools/profile_skinned.py round 5: render+full-readback
                # 162 ms of which the device frame is ~12).
                np.asarray(jnp.sum(r.accum))

            anim_pass(2, 1.0 / 30.0)  # warm the bridge/overlap path
            # 24 frames, best of 2 passes: at ~12 ms/frame an 8-frame
            # window was a single ~100 ms measurement — one tunnel-weather
            # hiccup (the dominant noise source; tools/profile_skinned.py)
            # halved the reported fps between same-code runs.
            nf = 24
            fps = 0.0
            for trial in range(2):
                t0 = time.perf_counter()
                anim_pass(nf, (3.0 + trial * nf) / 30.0)
                fps = max(fps, nf / max(time.perf_counter() - t0 - rt, 1e-6))
            emit("skinned_refit_512_d8_fps", fps, "frames/s")
        except Exception as e:
            emit("skinned_refit_512_d8_fps", -1.0, "frames/s",
                 error=str(e)[:120])

        # --- config 5: multichip layout (8-virtual-device dryrun) ---
        try:
            t0 = time.perf_counter()
            subprocess.run(
                [sys.executable, "-c",
                 "import __graft_entry__ as g; g.dryrun_multichip(8)"],
                check=True, capture_output=True, timeout=1200,
                cwd=__file__.rsplit("/", 1)[0])
            emit("multichip_dryrun_8dev_wall", time.perf_counter() - t0,
                 "s", ok=True)
        except Exception as e:
            emit("multichip_dryrun_8dev_wall", -1.0, "s", ok=False,
                 error=str(e)[:120])

    # headline LAST (the driver records the trailing JSON line)
    emit("cornell_512_d8_mrays_per_sec_per_chip", mrays_cornell, "Mrays/s",
         vs=mrays_cornell / BASELINE_MRAYS, **headline_golden)
    if _golden_failures:
        print("GOLDEN CHECK FAILED:\n  " + "\n  ".join(_golden_failures),
              file=sys.stderr, flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
