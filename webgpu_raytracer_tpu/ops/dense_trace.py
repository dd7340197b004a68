"""Path tracing over the dense world-triangle backend (the TPU hot path).

Same estimator and semantic contract as ops/trace.py (which documents the
mapping to reference Raytracer.wgsl) but with the entire pointer-chasing
layer removed: intersection is the Plucker matmul sweep (ops/dense.py /
ops/pallas_dense.py) and every shading fetch is a one-hot matmul row fetch
from the per-world-triangle shade table (ops/fetch.py). No instance
transforms in the loop: triangles, normals and lights are pre-baked to world
space per scene update (render/worldtris.py).

RNG consumption is identical to the BVH path (6 draws per bounce), so both
backends produce statistically identical images for the same (pixel, frame).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import bsdf
from .bsdf import PI, normalize, power_heuristic
from .dense import T_MAX, dense_closest, dense_shadow
from .fetch import gather_rows
from .rng import init_rng, rand_n, rand_pcg
from .trace import _offset_eps, camera_unpack, sample_texture
from ..render.worldtris import SHADE_COLS, WorldTris


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _col(row, name):
    lo, hi = SHADE_COLS[name]
    return row[:, lo:hi]


class DenseHit(NamedTuple):
    row: jnp.ndarray     # (R, SHADE_K) shade-table rows of the hit tris
    wt: jnp.ndarray      # (R,) world-tri index (-1 = miss)
    hit_t: jnp.ndarray   # (R,)
    tex_uv: jnp.ndarray  # (R, 2)
    normal: jnp.ndarray  # (R, 3) shading normal (normal-mapped)
    geom_n: jnp.ndarray  # (R, 3)
    albedo: jnp.ndarray  # (R, 3)


def shade_from_row(textures, row, ro, rd, hit_t):
    """Barycentric attributes for a known world triangle (world space).

    Same math as the reference's hit reconstruction (Raytracer.wgsl:738-779)
    minus the object-space round trip: barycentrics are affine-invariant so
    world-space Moller-Trumbore gives identical weights.
    """
    v0 = _col(row, "v0")
    e1 = _col(row, "e1")
    e2 = _col(row, "e2")

    s = ro - v0
    h = jnp.cross(rd, e2)
    a = _dot(e1, h)
    f = 1.0 / jnp.where(jnp.abs(a) > 1e-20, a, 1e-20)
    u = f * _dot(s, h)
    q = jnp.cross(s, e1)
    v = f * _dot(rd, q)
    w = 1.0 - u - v

    uv0 = _col(row, "uv0")
    uv1 = _col(row, "uv1")
    uv2 = _col(row, "uv2")
    tex_uv = uv0 * w[:, None] + uv1 * u[:, None] + uv2 * v[:, None]

    ln = normalize(
        _col(row, "n0") * w[:, None]
        + _col(row, "n1") * u[:, None]
        + _col(row, "n2") * v[:, None]
    )

    tex = _col(row, "tex")
    albedo = _col(row, "base_color") * sample_texture(
        textures, tex[:, 0].astype(jnp.int32), tex_uv
    )

    # Normal mapping with edge1 tangent (wgsl:770-776); world-space already.
    normal_tex = tex[:, 2].astype(jnp.int32)
    n_map = sample_texture(textures, normal_tex, tex_uv) * 2.0 - 1.0
    t_axis = normalize(e1)
    b_axis = normalize(jnp.cross(ln, t_axis))
    ln_mapped = normalize(
        t_axis * n_map[:, 0:1] + b_axis * n_map[:, 1:2] + ln * n_map[:, 2:3]
    )
    normal = jnp.where((normal_tex >= 0)[:, None], ln_mapped, ln)

    geom_n = normalize(jnp.cross(e1, e2))
    return tex_uv, normal, geom_n, albedo


def intersect_and_shade(wt: WorldTris, textures, ro, rd, active) -> DenseHit:
    if jax.default_backend() == "tpu":
        from .pallas_dense import pallas_closest_with_row

        t, idx, row = pallas_closest_with_row(wt, ro, rd, active=active)
    else:
        t, idx = dense_closest(wt, ro, rd, active=active)
        row = gather_rows(wt.shade_table, jnp.maximum(idx, 0))
    tex_uv, normal, geom_n, albedo = shade_from_row(textures, row, ro, rd, t)
    return DenseHit(row, idx, t, tex_uv, normal, geom_n, albedo)


def sample_light_dense(wt: WorldTris, textures, hit_p, r0, r1, r2):
    """NEE light sample over world-tri lights (wgsl:345-399 semantics)."""
    lc = wt.light_count
    lc_f = jnp.maximum(lc.astype(jnp.float32), 1.0)
    pick = jnp.clip((r0 * lc_f).astype(jnp.int32), 0, jnp.maximum(lc - 1, 0))
    # light_wt is tiny; fetch ids then rows via one matmul fetch
    wt_ids = gather_rows(
        wt.light_wt[:, None].astype(jnp.float32), pick
    )[:, 0].astype(jnp.int32)
    row = gather_rows(wt.shade_table, wt_ids)

    v0 = _col(row, "v0")
    e1 = _col(row, "e1")
    e2 = _col(row, "e2")

    sqrt_r1 = jnp.sqrt(r1)
    u = 1.0 - sqrt_r1
    v = r2 * sqrt_r1
    w = 1.0 - u - v
    # p = v0*u + v1*v + v2*w with v1 = v0+e1, v2 = v0+e2
    p = v0 + e1 * v[:, None] + e2 * w[:, None]

    cr = jnp.cross(e1, e2)
    n_raw = normalize(cr)
    area = jnp.linalg.norm(cr, axis=-1) * 0.5

    l_dir = p - hit_p
    dist_sq = _dot(l_dir, l_dir)
    dist = jnp.sqrt(dist_sq)
    unit_l = l_dir / jnp.maximum(dist, 1e-20)[:, None]
    cos_theta_l = jnp.maximum(_dot(n_raw, -unit_l), 0.0)

    uv0 = _col(row, "uv0")
    uv1 = _col(row, "uv1")
    uv2 = _col(row, "uv2")
    tex_uv = uv0 * u[:, None] + uv1 * v[:, None] + uv2 * w[:, None]
    tex = _col(row, "tex")
    L = _col(row, "base_color") * sample_texture(
        textures, tex[:, 0].astype(jnp.int32), tex_uv
    )

    pdf = dist_sq / jnp.maximum(cos_theta_l * area, 1e-20) / lc_f
    valid = (lc > 0) & (cos_theta_l >= 1e-6) & (area > 0.0)
    pdf = jnp.where(valid, pdf, 0.0)
    return L, unit_l, dist, pdf


def light_pdf_from_row(wt: WorldTris, row, t, l_dir):
    """MIS pdf of the emissive triangle just hit (wgsl:401-421)."""
    cr = jnp.cross(_col(row, "e1"), _col(row, "e2"))
    area = jnp.linalg.norm(cr, axis=-1) * 0.5
    n = normalize(cr)
    cos_theta_l = jnp.maximum(_dot(n, -l_dir), 0.0)
    lc_f = jnp.maximum(wt.light_count.astype(jnp.float32), 1.0)
    pdf = (t * t) / jnp.maximum(cos_theta_l * area, 1e-20) / lc_f
    return jnp.where(cos_theta_l >= 1e-4, pdf, 0.0)


def ray_color_dense(wt: WorldTris, textures, ro, rd, rng, max_depth: int):
    R = ro.shape[0]
    f32 = jnp.float32

    hit0 = intersect_and_shade(wt, textures, ro, rd,
                               jnp.ones(R, bool))
    active0 = hit0.wt >= 0

    class _S(NamedTuple):
        active: jnp.ndarray
        ro: jnp.ndarray
        rd: jnp.ndarray
        throughput: jnp.ndarray
        radiance: jnp.ndarray
        rng: jnp.ndarray
        prev_pdf: jnp.ndarray
        specular_bounce: jnp.ndarray
        hit: DenseHit

    state = _S(
        active=active0,
        ro=ro,
        rd=rd,
        throughput=jnp.ones((R, 3), f32),
        radiance=jnp.zeros((R, 3), f32),
        rng=rng,
        prev_pdf=jnp.zeros(R, f32),
        specular_bounce=jnp.ones(R, bool),
        hit=hit0,
    )

    def body(depth, s: _S):
        row = s.hit.row
        mat = _col(row, "mat")[:, 0].astype(jnp.int32)
        mrir = _col(row, "mrir")
        tex = _col(row, "tex").astype(jnp.int32)
        emissive0 = _col(row, "emissive")

        hit_p = s.ro + s.rd * s.hit.hit_t[:, None]

        normal = jnp.where((_dot(s.rd, s.hit.normal) < 0.0)[:, None],
                           s.hit.normal, -s.hit.normal)
        geom_n = jnp.where((_dot(s.rd, s.hit.geom_n) < 0.0)[:, None],
                           s.hit.geom_n, -s.hit.geom_n)

        metallic = mrir[:, 0]
        roughness = mrir[:, 1]
        mr = sample_texture(textures, tex[:, 1], s.hit.tex_uv)
        metallic = jnp.where(tex[:, 1] >= 0, metallic * mr[:, 2], metallic)
        roughness = jnp.where(tex[:, 1] >= 0, roughness * mr[:, 1], roughness)
        roughness = jnp.maximum(roughness, 0.005)
        ior = mrir[:, 2]

        emissive = emissive0 * jnp.where(
            (tex[:, 3] >= 0)[:, None],
            sample_texture(textures, tex[:, 3], s.hit.tex_uv), 1.0)

        albedo = s.hit.albedo
        f0 = 0.04 + (albedo - 0.04) * metallic[:, None]

        # --- Emissive / light hit with MIS ---
        is_light = mat == 3
        has_em = is_light | (jnp.linalg.norm(emissive, axis=-1) > 1e-4)
        em_val = jnp.where(is_light[:, None], albedo, emissive)
        lp = light_pdf_from_row(wt, row, s.hit.hit_t, s.rd)
        mis_w = jnp.where(s.specular_bounce, 1.0,
                          power_heuristic(s.prev_pdf, lp))
        radiance = s.radiance + jnp.where(
            (s.active & has_em)[:, None],
            s.throughput * em_val * mis_w[:, None], 0.0)
        active = s.active & ~is_light

        # --- NEE ---
        rng, (r0, r1, r2) = rand_n(s.rng, 3)
        L, ldir, ldist, lpdf = sample_light_dense(wt, textures, hit_p,
                                                  r0, r1, r2)
        nee_lane = active & (mat != 2) & (lpdf > 0.0)
        eps = _offset_eps(hit_p)
        end_eps = jnp.maximum(eps, _offset_eps(hit_p + ldir * ldist[:, None]))
        occluded = dense_shadow(
            wt, hit_p + geom_n * eps[:, None], ldir,
            t_max=ldist - 2.0 * end_eps, active=nee_lane)
        n_dot_l = jnp.maximum(_dot(normal, ldir), 0.0)
        bsdf_val = jnp.where(
            (mat == 0)[:, None], bsdf.eval_diffuse(albedo),
            bsdf.eval_ggx(normal, -s.rd, ldir, roughness, f0))
        bsdf_pdf = jnp.where(mat == 0, n_dot_l / PI,
                             bsdf.ggx_pdf(normal, -s.rd, ldir, roughness))
        contrib = (s.throughput * bsdf_val * L
                   * (power_heuristic(lpdf, bsdf_pdf) * n_dot_l /
                      jnp.maximum(lpdf, 1e-20))[:, None])
        take = nee_lane & ~occluded & (bsdf_pdf > 0.0)
        radiance = radiance + jnp.where(take[:, None], contrib, 0.0)

        # --- BSDF sampling ---
        rng, (s1, s2) = rand_n(rng, 2)
        sc_d = bsdf.sample_diffuse(normal, albedo, s1, s2)
        sc_m = bsdf.sample_ggx(normal, -s.rd, roughness, f0, s1, s2)
        sc_g = bsdf.sample_dielectric(s.rd, normal, ior, albedo, s1)

        is_m = (mat == 1)[:, None]
        is_g = (mat == 2)[:, None]
        dirn = jnp.where(is_g, sc_g.dir, jnp.where(is_m, sc_m.dir, sc_d.dir))
        pdf = jnp.where(is_g[:, 0], sc_g.pdf,
                        jnp.where(is_m[:, 0], sc_m.pdf, sc_d.pdf))
        tp = jnp.where(is_g, sc_g.throughput,
                       jnp.where(is_m, sc_m.throughput, sc_d.throughput))
        is_spec = jnp.where(is_g[:, 0], sc_g.is_specular,
                            jnp.where(is_m[:, 0], sc_m.is_specular,
                                      sc_d.is_specular))

        bad = (mat != 2) & (_dot(dirn, geom_n) <= 0.0)
        pdf = jnp.where(bad, 0.0, pdf)
        tp = jnp.where(bad[:, None], 0.0, tp)

        active = active & (pdf > 0.0) & (jnp.linalg.norm(tp, axis=-1) > 0.0)
        throughput = jnp.where(active[:, None], s.throughput * tp,
                               s.throughput)

        off_n = jnp.where((_dot(dirn, geom_n) > 0.0)[:, None], geom_n, -geom_n)
        ro_next = jnp.where(active[:, None], hit_p + off_n * eps[:, None], s.ro)
        rd_next = jnp.where(active[:, None], dirn, s.rd)
        prev_pdf = jnp.where(active, pdf, s.prev_pdf)
        specular_bounce = jnp.where(active, is_spec, s.specular_bounce)

        # --- Russian roulette ---
        rng, rr = rand_pcg(rng)
        p = jnp.max(throughput, axis=-1)
        do_rr = active & (depth > 3)
        active = active & ~(do_rr & (rr > p))
        throughput = jnp.where(
            (do_rr & (rr <= p))[:, None],
            throughput / jnp.maximum(p, 1e-20)[:, None], throughput)

        # --- Next hit ---
        do_next = active & (depth < max_depth - 1)
        nhit = intersect_and_shade(wt, textures, ro_next, rd_next, do_next)
        found = do_next & (nhit.wt >= 0)
        active = jnp.where(depth < max_depth - 1, found, active)

        def sel(new, old):
            mask = found
            while mask.ndim < new.ndim:
                mask = mask[..., None]
            return jnp.where(mask, new, old)

        hit = DenseHit(
            row=sel(nhit.row, s.hit.row),
            wt=sel(nhit.wt, s.hit.wt),
            hit_t=sel(nhit.hit_t, s.hit.hit_t),
            tex_uv=sel(nhit.tex_uv, s.hit.tex_uv),
            normal=sel(nhit.normal, normal),
            geom_n=sel(nhit.geom_n, geom_n),
            albedo=sel(nhit.albedo, s.hit.albedo),
        )

        return _S(active, ro_next, rd_next, throughput, radiance, rng,
                  prev_pdf, specular_bounce, hit)

    out = jax.lax.fori_loop(0, max_depth, body, state)
    return out.radiance, out.rng


def trace_pixels_dense(wt: WorldTris, textures, camera24, frame_count, jitter,
                       width: int, height: int, spp: int, max_depth: int,
                       row0=0, full_height: int | None = None,
                       total_spp: int | None = None, sample0=0):
    """Dense-backend frame render; same signature semantics as
    ops.trace.trace_pixels (tile/sample sharding offsets included)."""
    if full_height is None:
        full_height = height
    if total_spp is None:
        total_spp = spp
    cam = camera_unpack(camera24)
    R = width * height
    lane = jnp.arange(R, dtype=jnp.uint32)
    px = (lane % jnp.uint32(width)).astype(jnp.float32)
    gy = lane // jnp.uint32(width) + jnp.asarray(row0, jnp.uint32)
    py = gy.astype(jnp.float32)
    p_idx = gy * jnp.uint32(width) + (lane % jnp.uint32(width))

    def one_sample(i, acc):
        rng = init_rng(
            p_idx,
            frame_count.astype(jnp.uint32) * jnp.uint32(total_spp)
            + jnp.asarray(sample0, jnp.uint32) + i.astype(jnp.uint32))
        rng, (dr1, dr2) = rand_n(rng, 2)
        dx, dy = bsdf.random_in_unit_disk(dr1, dr2)
        off = (cam["u_axis"][None, :] * (cam["lens_radius"] * dx)[:, None]
               + cam["v_axis"][None, :] * (cam["lens_radius"] * dy)[:, None])
        u = (px + 0.5 + jitter[0] * width) / width
        v = 1.0 - (py + 0.5 + jitter[1] * full_height) / full_height
        d = (cam["lower_left"][None, :]
             + u[:, None] * cam["horizontal"][None, :]
             + v[:, None] * cam["vertical"][None, :]
             - cam["origin"][None, :] - off)
        ro = cam["origin"][None, :] + off
        col, _ = ray_color_dense(wt, textures, ro, d, rng, max_depth)
        return acc + col

    col = jax.lax.fori_loop(0, spp, one_sample, jnp.zeros((R, 3), jnp.float32))
    return col / spp
