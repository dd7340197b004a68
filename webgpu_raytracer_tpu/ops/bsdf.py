"""BSDF evaluation and sampling, vectorized over ray lanes.

Semantics match the reference kernels (Raytracer.wgsl:191-339): cosine-
hemisphere Lambertian via a branchless ONB, GGX metal (D-sampling, Smith G,
Schlick F, pdf = D*NdotH/(4*VdotH), specular flag when roughness < 0.01) and
Schlick dielectric with reflect/refract selection. All branches are computed
for every lane and combined with selects — there is no per-lane control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

PI = 3.141592653589793


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def reflect(i, n):
    return i - 2.0 * _dot(n, i)[..., None] * n


def refract(i, n, eta):
    """WGSL refract() semantics: zero vector on total internal reflection."""
    cos_i = _dot(n, i)
    k = 1.0 - eta[..., None] * eta[..., None] * (1.0 - cos_i[..., None] ** 2)
    ok = k[..., 0] >= 0.0
    out = eta[..., None] * i - (eta * cos_i + jnp.sqrt(jnp.maximum(k[..., 0], 0.0)))[
        ..., None
    ] * n
    return jnp.where(ok[..., None], out, 0.0)


def build_onb(n):
    """Branchless orthonormal basis (Raytracer.wgsl:207-214). Returns (u, v)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    u = jnp.stack(
        [1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    v = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return u, v


def local_to_world(u, v, w, a):
    return a[..., 0:1] * u + a[..., 1:2] * v + a[..., 2:3] * w


def cosine_hemisphere(n, r1, r2):
    """Cosine-weighted direction about n (Raytracer.wgsl:191-199)."""
    u, v = build_onb(n)
    phi = 2.0 * PI * r1
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
    sin_theta = jnp.sqrt(jnp.maximum(r2, 0.0))
    local = jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )
    return local_to_world(u, v, n, local)


def random_in_unit_disk(r1, r2):
    r = jnp.sqrt(r1)
    theta = 2.0 * PI * r2
    return r * jnp.cos(theta), r * jnp.sin(theta)


class Scatter(NamedTuple):
    dir: jnp.ndarray          # (R, 3)
    pdf: jnp.ndarray          # (R,)
    throughput: jnp.ndarray   # (R, 3)
    is_specular: jnp.ndarray  # (R,) bool


def eval_diffuse(albedo):
    return albedo / PI


def sample_diffuse(normal, albedo, r1, r2) -> Scatter:
    d = cosine_hemisphere(normal, r1, r2)
    cos_theta = jnp.maximum(_dot(normal, d), 0.0)
    return Scatter(d, cos_theta / PI, albedo, jnp.zeros(r1.shape, bool))


def ggx_d(n_dot_h, a2):
    d = (n_dot_h * a2 - n_dot_h) * n_dot_h + 1.0
    return a2 / (PI * d * d)


def ggx_g(n_dot_v, n_dot_l, a2):
    g1v = 2.0 * n_dot_v / (n_dot_v + jnp.sqrt(a2 + (1.0 - a2) * n_dot_v**2))
    g1l = 2.0 * n_dot_l / (n_dot_l + jnp.sqrt(a2 + (1.0 - a2) * n_dot_l**2))
    return g1v * g1l


def fresnel_schlick(cos_theta, f0):
    p = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return f0 + (1.0 - f0) * (p**5)[..., None]


def eval_ggx(n, v, l, roughness, f0):
    """Full microfacet BRDF value (Raytracer.wgsl:256-269)."""
    h = normalize(v + l)
    n_dot_v = jnp.maximum(_dot(n, v), 1e-4)
    n_dot_l = jnp.maximum(_dot(n, l), 1e-4)
    n_dot_h = jnp.maximum(_dot(n, h), 1e-4)
    v_dot_h = jnp.maximum(_dot(v, h), 1e-4)
    a2 = roughness * roughness
    d = ggx_d(n_dot_h, a2)
    g = ggx_g(n_dot_v, n_dot_l, a2)
    f = fresnel_schlick(v_dot_h, f0)
    return (d * g)[..., None] * f / (4.0 * n_dot_v * n_dot_l)[..., None]


def ggx_pdf(n, v, l, roughness):
    """pdf of sample_ggx for MIS weighting of NEE (Raytracer.wgsl:692-693)."""
    h = normalize(v + l)
    n_dot_h = _dot(n, h)
    v_dot_h = jnp.maximum(_dot(v, h), 0.0)
    return (ggx_d(n_dot_h, roughness * roughness) * jnp.maximum(n_dot_h, 0.0)) / (
        4.0 * jnp.maximum(v_dot_h, 1e-8)
    )


def sample_ggx(n, v, roughness, f0, r1, r2) -> Scatter:
    """GGX D-distribution sampling (Raytracer.wgsl:271-306)."""
    a = roughness
    phi = 2.0 * PI * r1
    cos_theta = jnp.sqrt(jnp.maximum(0.0, (1.0 - r2) / (1.0 + (a * a - 1.0) * r2)))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta**2))
    h_local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    u, vv = build_onb(n)
    h = local_to_world(u, vv, n, h_local)
    l = reflect(-v, h)

    below = _dot(n, l) <= 0.0

    n_dot_v = jnp.maximum(_dot(n, v), 1e-4)
    n_dot_l = jnp.maximum(_dot(n, l), 1e-4)
    n_dot_h = jnp.maximum(_dot(n, h), 1e-4)
    v_dot_h = jnp.maximum(_dot(v, h), 1e-4)

    a2 = a * a
    d = ggx_d(n_dot_h, a2)
    g = ggx_g(n_dot_v, n_dot_l, a2)
    f = fresnel_schlick(v_dot_h, f0)

    pdf = (d * n_dot_h) / (4.0 * v_dot_h)
    tp = jnp.where(
        (pdf > 1e-6)[..., None],
        (g * v_dot_h / (n_dot_v * n_dot_h))[..., None] * f,
        0.0,
    )
    pdf = jnp.where(below, 0.0, pdf)
    tp = jnp.where(below[..., None], 0.0, tp)
    l = jnp.where(below[..., None], 0.0, l)
    return Scatter(l, pdf, tp, roughness < 0.01)


def reflectance_dielectric(cosine, ref_idx):
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * jnp.clip(1.0 - cosine, 0.0, 1.0) ** 5


def sample_dielectric(dir, normal, ior, albedo, r1) -> Scatter:
    """Schlick dielectric (Raytracer.wgsl:314-339).

    `normal` arrives already flipped to oppose the ray (the caller flips every
    bounce, wgsl:660), which matches the reference's effective behavior.
    """
    front_face = _dot(dir, normal) < 0.0
    ratio = jnp.where(front_face, 1.0 / ior, ior)
    n = jnp.where(front_face[..., None], normal, -normal)

    unit = normalize(dir)
    cos_theta = jnp.minimum(_dot(-unit, n), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))

    cannot_refract = ratio * sin_theta > 1.0
    do_reflect = cannot_refract | (reflectance_dielectric(cos_theta, ratio) > r1)
    d = jnp.where(
        do_reflect[..., None], reflect(unit, n), refract(unit, n, ratio)
    )
    ones = jnp.ones(r1.shape, jnp.float32)
    return Scatter(d, ones, albedo, jnp.ones(r1.shape, bool))


def power_heuristic(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    return a2 / jnp.maximum(a2 + b2, 1e-20)
