"""Per-bounce shading as ONE Pallas kernel (the TPU shade pass).

The jnp bounce pipeline (ops/dense_trace._bounce) compiles to ~30 small XLA
fusions per bounce; at 512^2 each is launch-overhead-bound (~20-150 us for
<= 1 MB of elementwise work), costing ~1 ms/bounce of the ~1.6 ms total.
This module packs the ENTIRE bounce update — hit reconstruction from the
winner shade rows, emissive MIS, NEE light sampling, all three BSDF
branches, Russian roulette, and the previous bounce's NEE resolution — into
one VPU kernel over ray tiles.

The math is the SAME code as the jnp path: `shade_step` below is pure jnp
(reusing ops/bsdf_v3, ops/rng, ops/v3) and is traced either inside
`pl.pallas_call` (TPU) or directly (tests/reference). RNG draw order is the
contract (6 draws/bounce, identical streams to ops/dense_trace).

Scope: scenes whose texture operand is the 1x1 white placeholder (all
procedural presets — including the benchmark headline). Textured scenes
keep the jnp pipeline (texel gathers can't run inside the kernel).

State row layout (f32; rows 0..14 are shared between input and output so
the inter-bounce glue is one 19-row slice + a 1-row concat):
   0 active        1-3 ro         4-6 rd        7-9 throughput
  10-12 radiance  13 prev_pdf    14 specular_bounce
  in : 15 nee_prev (prev bounce's shadow-lane mask)
       16-18 pending_nee (prev bounce's unresolved NEE contribution)
       19 occluded_prev (prev fused sweep's shadow verdict)
  out: 15 nee_lane  16-18 pending_nee  19-21 sro  22-24 srd
       25 s_tmax    26 do_next
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bsdf_v3 as bsdf
from .bsdf_v3 import PI, power_heuristic
from .rng import rand_n, rand_pcg
from .v3 import V3, cross, dot, length, max_component, normalize, where
from ..render.worldtris import SHADE_COLS, SHADE_K

NS_IN = 20
NS_OUT = 27
M_SHADE = 2048   # lanes per shade tile
LROWS_PAD = 128  # light-row table lane padding (kernel one-hot width)


def _rv3(rowT, name) -> V3:
    lo, _ = SHADE_COLS[name]
    return V3(rowT[lo], rowT[lo + 1], rowT[lo + 2])


def _rf(rowT, name, k=0):
    lo, _ = SHADE_COLS[name]
    return rowT[lo + k]


def _offset_eps(p: V3):
    m = jnp.maximum(jnp.abs(p.x), jnp.maximum(jnp.abs(p.y), jnp.abs(p.z)))
    return 1e-4 * jnp.maximum(1.0, m)


def _bsel(c, a, b):
    """where() over booleans as pure algebra — Mosaic lacks i1 select_n."""
    return (c & a) | (~c & b)


class ShadeOut(NamedTuple):
    state: jnp.ndarray  # (NS_OUT, M)
    rng: jnp.ndarray    # (M,) u32


def shade_step(state, rng, rowT, idxf, lrowsT, depth, light_count,
               max_depth: int) -> ShadeOut:
    """One bounce update over (M,) lanes. Pure jnp (Pallas-traceable).

    state (NS_IN, M) f32; rng (M,) u32; rowT (SHADE_K, M) f32 winner rows;
    idxf (M,) f32 winner index (-1 miss); lrowsT (SHADE_K, LROWS_PAD) f32
    light rows (column j = light j); depth / light_count traced scalars;
    max_depth static. Semantics == ops/dense_trace._bounce with the 1x1
    white texture operand (texel == 1 wherever a map is bound).
    """
    f32 = jnp.float32
    ro = V3(state[1], state[2], state[3])
    rd = V3(state[4], state[5], state[6])
    throughput = V3(state[7], state[8], state[9])
    radiance = V3(state[10], state[11], state[12])
    prev_pdf = state[13]
    specular_bounce = state[14] > 0.5
    nee_prev = state[15] > 0.5
    pending = V3(state[16], state[17], state[18])
    occluded_prev = state[19] > 0.5

    ones = jnp.ones_like(state[0])
    zeros = jnp.zeros_like(state[0])

    # --- resolve the PREVIOUS bounce's NEE with this sweep's occlusion ---
    take_prev = nee_prev & ~occluded_prev
    radiance = radiance + pending * jnp.where(take_prev, 1.0, 0.0)

    idx_ok = idxf >= 0.0
    active = (state[0] > 0.5) & idx_ok

    # --- hit reconstruction from the winner row (shade_from_rowT +
    # _mt_refine_t, with the white texel) ---
    v0 = _rv3(rowT, "v0")
    e1 = _rv3(rowT, "e1")
    e2 = _rv3(rowT, "e2")
    sv = ro - v0
    h = cross(rd, e2)
    a = dot(e1, h)
    f = 1.0 / jnp.where(jnp.abs(a) > 1e-20, a, 1e-20)
    u = f * dot(sv, h)
    q = cross(sv, e1)
    v = f * dot(rd, q)
    w = 1.0 - u - v
    hit_t = jnp.where(idx_ok, f * dot(e2, q), 0.0)

    ln = normalize(_rv3(rowT, "n0") * w + _rv3(rowT, "n1") * u
                   + _rv3(rowT, "n2") * v)
    normal_tex = _rf(rowT, "tex", 2)
    nt_on = idx_ok & (normal_tex >= 0.0)
    # white texel: n_map = (1,1,1)*2-1 = (1,1,1)
    t_axis = normalize(e1)
    b_axis = normalize(cross(ln, t_axis))
    ln_mapped = normalize(t_axis + b_axis + ln)
    s_normal = where(nt_on, ln_mapped, ln)
    s_geom = normalize(cross(e1, e2))
    albedo = _rv3(rowT, "base_color")  # x white texture

    hit_p = ro + rd * hit_t
    normal = where(dot(rd, s_normal) < 0.0, s_normal, -s_normal)
    geom_n = where(dot(rd, s_geom) < 0.0, s_geom, -s_geom)

    mat = _rf(rowT, "mat")
    tex_mr_on = active & (_rf(rowT, "tex", 1) >= 0.0)
    metallic = _rf(rowT, "mrir", 0)   # white texel: * mr.z == * 1
    roughness = jnp.maximum(_rf(rowT, "mrir", 1), 0.005)
    del tex_mr_on  # white texel multiplies are identity
    ior = _rf(rowT, "mrir", 2)
    emissive = _rv3(rowT, "emissive")
    f0 = albedo * metallic + (0.04 * (1.0 - metallic))

    # --- emissive / light hit with MIS ---
    is_light = mat == 3.0
    has_em = is_light | (length(emissive) > 1e-4)
    em_val = where(is_light, albedo, emissive)
    cr = cross(e1, e2)
    area = length(cr) * 0.5
    n_raw = normalize(cr)
    cos_tl = jnp.maximum(dot(n_raw, -rd), 0.0)
    lc_f = jnp.maximum(light_count.astype(f32), 1.0)
    lp = (hit_t * hit_t) / jnp.maximum(cos_tl * area, 1e-20) / lc_f
    lp = jnp.where(cos_tl >= 1e-4, lp, 0.0)
    mis_w = jnp.where(specular_bounce, 1.0, power_heuristic(prev_pdf, lp))
    add = jnp.where(active & has_em, mis_w, 0.0)
    radiance = radiance + throughput * em_val * add
    active = active & ~is_light

    # --- NEE light sample (sample_light_dense, white texel) ---
    rng, (r0, r1, r2) = rand_n(rng, 3)
    pick = jnp.clip((r0 * lc_f).astype(jnp.int32), 0,
                    jnp.maximum(light_count - 1, 0))
    iota = jax.lax.broadcasted_iota(jnp.int32, (LROWS_PAD, pick.shape[-1]),
                                    0)
    oh = iota == pick[None, :]
    lrow = jnp.dot(lrowsT, oh.astype(f32),
                   precision=jax.lax.Precision.HIGHEST)   # (SHADE_K, M)
    lv0 = _rv3(lrow, "v0")
    le1 = _rv3(lrow, "e1")
    le2 = _rv3(lrow, "e2")
    sqrt_r1 = jnp.sqrt(r1)
    lu = 1.0 - sqrt_r1
    lv = r2 * sqrt_r1
    lpnt = lv0 + le1 * lv + le2 * (1.0 - lu - lv)
    lcr = cross(le1, le2)
    ln_raw = normalize(lcr)
    larea = length(lcr) * 0.5
    l_dir = lpnt - hit_p
    dist_sq = dot(l_dir, l_dir)
    ldist = jnp.sqrt(dist_sq)
    ldir = l_dir * (1.0 / jnp.maximum(ldist, 1e-20))
    cos_theta_l = jnp.maximum(dot(ln_raw, -ldir), 0.0)
    L = _rv3(lrow, "base_color")  # x white texture
    lpdf = dist_sq / jnp.maximum(cos_theta_l * larea, 1e-20) / lc_f
    lvalid = (light_count > 0) & (cos_theta_l >= 1e-6) & (larea > 0.0)
    lpdf = jnp.where(lvalid, lpdf, 0.0)

    nee_lane = active & (mat != 2.0) & (lpdf > 0.0)
    eps = _offset_eps(hit_p)
    end_eps = jnp.maximum(eps, _offset_eps(hit_p + ldir * ldist))
    n_dot_l = jnp.maximum(dot(normal, ldir), 0.0)
    is_diff = mat == 0.0
    bsdf_val = where(is_diff, bsdf.eval_diffuse(albedo),
                     bsdf.eval_ggx(normal, -rd, ldir, roughness, f0))
    bsdf_pdf = jnp.where(is_diff, n_dot_l / PI,
                         bsdf.ggx_pdf(normal, -rd, ldir, roughness))
    wgt = jnp.where(nee_lane & (bsdf_pdf > 0.0),
                    power_heuristic(lpdf, bsdf_pdf) * n_dot_l /
                    jnp.maximum(lpdf, 1e-20), 0.0)
    new_pending = throughput * bsdf_val * L * wgt

    # --- BSDF sampling ---
    rng, (s1, s2) = rand_n(rng, 2)
    sc_d = bsdf.sample_diffuse(normal, albedo, s1, s2)
    sc_m = bsdf.sample_ggx(normal, -rd, roughness, f0, s1, s2)
    sc_g = bsdf.sample_dielectric(rd, normal, ior, albedo, s1)
    is_m = mat == 1.0
    is_g = mat == 2.0
    dirn = where(is_g, sc_g.dir, where(is_m, sc_m.dir, sc_d.dir))
    pdf = jnp.where(is_g, sc_g.pdf, jnp.where(is_m, sc_m.pdf, sc_d.pdf))
    tp = where(is_g, sc_g.throughput,
               where(is_m, sc_m.throughput, sc_d.throughput))
    is_spec = _bsel(is_g, sc_g.is_specular,
                    _bsel(is_m, sc_m.is_specular, sc_d.is_specular))

    bad = (mat != 2.0) & (dot(dirn, geom_n) <= 0.0)
    pdf = jnp.where(bad, 0.0, pdf)
    tp = tp * jnp.where(bad, 0.0, 1.0)

    active2 = active & (pdf > 0.0) & (length(tp) > 0.0)
    throughput2 = where(active2, throughput * tp, throughput)
    off_n = where(dot(dirn, geom_n) > 0.0, geom_n, -geom_n)
    ro_next = where(active2, hit_p + off_n * eps, ro)
    rd_next = where(active2, dirn, rd)
    prev_pdf2 = jnp.where(active2, pdf, prev_pdf)
    spec2 = _bsel(active2, is_spec, specular_bounce)

    # --- Russian roulette after depth 3 ---
    rng, rr = rand_pcg(rng)
    p = max_component(throughput2)
    do_rr = active2 & (depth > 3)
    active3 = active2 & ~(do_rr & (rr > p))
    scale = jnp.where(do_rr & (rr <= p), 1.0 / jnp.maximum(p, 1e-20), 1.0)
    throughput3 = throughput2 * scale

    do_next = active3 & (depth < max_depth - 1)
    active_out = _bsel(depth < max_depth - 1, do_next, active3)

    sro = hit_p + geom_n * eps
    s_tmax = jnp.where(nee_lane, ldist - 2.0 * end_eps, 0.0)

    b = lambda m: jnp.where(m, ones, zeros)
    state_out = jnp.stack([
        b(active_out), ro_next.x, ro_next.y, ro_next.z,
        rd_next.x, rd_next.y, rd_next.z,
        throughput3.x, throughput3.y, throughput3.z,
        radiance.x, radiance.y, radiance.z,
        prev_pdf2, b(spec2),
        b(nee_lane),
        new_pending.x, new_pending.y, new_pending.z,
        sro.x, sro.y, sro.z,
        ldir.x, ldir.y, ldir.z,
        s_tmax, b(do_next),
    ], axis=0)
    return ShadeOut(state_out, rng)


def _shade_kernel(scal_ref, state_ref, rng_ref, rowT_ref, idx_ref, lrows_ref,
                  out_ref, rng_out_ref, *, max_depth: int):
    outs = shade_step(state_ref[...], rng_ref[0, :], rowT_ref[...],
                      idx_ref[0, :], lrows_ref[...], scal_ref[0],
                      scal_ref[1], max_depth)
    out_ref[...] = outs.state
    rng_out_ref[0, :] = outs.rng


def pallas_shade(state, rng, rowT, idxf, lrowsT, depth, light_count,
                 max_depth: int, interpret: bool = False):
    """Tile the shade step over lanes. state (NS_IN, R) f32, rng (R,) u32,
    rowT (SHADE_K, R), idxf (R,) f32, lrowsT (SHADE_K, LROWS_PAD)."""
    R = state.shape[1]
    r_pad = (-R) % M_SHADE
    if r_pad:
        state = jnp.pad(state, ((0, 0), (0, r_pad)))
        rng = jnp.pad(rng, (0, r_pad))
        rowT = jnp.pad(rowT, ((0, 0), (0, r_pad)))
        idxf = jnp.pad(idxf, (0, r_pad), constant_values=-1.0)
    rp = R + r_pad
    scal = jnp.stack([jnp.asarray(depth, jnp.int32),
                      jnp.asarray(light_count, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rp // M_SHADE,),
        in_specs=[
            pl.BlockSpec((NS_IN, M_SHADE), lambda i, s: (0, i)),
            pl.BlockSpec((1, M_SHADE), lambda i, s: (0, i)),
            pl.BlockSpec((SHADE_K, M_SHADE), lambda i, s: (0, i)),
            pl.BlockSpec((1, M_SHADE), lambda i, s: (0, i)),
            pl.BlockSpec((SHADE_K, LROWS_PAD), lambda i, s: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((NS_OUT, M_SHADE), lambda i, s: (0, i)),
            pl.BlockSpec((1, M_SHADE), lambda i, s: (0, i)),
        ],
    )
    out, rng_out = pl.pallas_call(
        functools.partial(_shade_kernel, max_depth=max_depth),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NS_OUT, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(scal, state, rng[None, :], rowT, idxf[None, :], lrowsT)
    return out[:, :R], rng_out[0, :R]
