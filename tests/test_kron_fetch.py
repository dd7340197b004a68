"""Kronecker one-hot fetch (ops/fetch.TexKron + pallas_fetch_kron).

The secondary-bounce texture mip is served by MXU matmuls against a
VMEM-resident bf16x3 plane table instead of the XLA gather emitter
(utils/textures.py history note). These tests pin:

- bit-exact row reconstruction (interpret mode, real kernel body) for
  u24-valued quad words including boundary values;
- the sampler's TexKron branch matching the plain-table sampler;
- the pyramid builder producing a TexKron level within the row cap.
"""

import numpy as np
import jax.numpy as jnp

from webgpu_raytracer_tpu.ops.fetch import (KRON_LO, TexKron, build_tex_kron,
                                            kron_rows)
from webgpu_raytracer_tpu.ops.pallas_dense import pallas_fetch_kron
from webgpu_raytracer_tpu.ops.dense_trace import sample_texture_v3, tex_level
from webgpu_raytracer_tpu.utils.textures import (SECONDARY_MIP,
                                                 build_quad_pyramid,
                                                 pack_quad_table)


def _rand_quad(k=1, s=128, seed=0):
    rng = np.random.default_rng(seed)
    tex = rng.random((k, s, s, 3)).astype(np.float32)
    return pack_quad_table(tex)


def test_kron_rows_bit_exact_interpret():
    quad = _rand_quad()
    # plant boundary words: 0, 2^24-1, single-byte extremes
    flat = quad.reshape(-1, 4)
    flat[0] = [0, (1 << 24) - 1, 0xFF0000, 0x0000FF]
    flat[1] = [0x010101, 0x808080, 0xFFFFFF, 1]
    kt = build_tex_kron(quad)
    rng = np.random.default_rng(1)
    idx = np.concatenate([
        np.arange(16), [127, 128, 129, flat.shape[0] - 1],
        rng.integers(0, flat.shape[0], 4000)]).astype(np.int32)
    got = pallas_fetch_kron(jnp.asarray(kt.t2), jnp.asarray(idx), 4,
                            interpret=True)
    want = flat[idx].astype(np.float32)   # u24 words are exact in f32
    np.testing.assert_array_equal(np.asarray(got).T, want)


def test_kron_rows_multi_image():
    quad = _rand_quad(k=3, s=64, seed=2)
    kt = build_tex_kron(quad)
    flat = quad.reshape(-1, 4)
    idx = np.arange(0, flat.shape[0], 7, dtype=np.int32)
    got = pallas_fetch_kron(jnp.asarray(kt.t2), jnp.asarray(idx), 4,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got).T,
                                  flat[idx].astype(np.float32))


def test_sampler_texkron_matches_plain():
    quad = _rand_quad(k=2, s=64, seed=3)
    kt = TexKron(*(jnp.asarray(a) for a in build_tex_kron(quad)))
    plain = jnp.asarray(quad)
    rng = np.random.default_rng(4)
    n = 1000
    u = jnp.asarray(rng.uniform(-1.5, 2.5, n), jnp.float32)
    v = jnp.asarray(rng.uniform(-1.5, 2.5, n), jnp.float32)
    tex_idx = jnp.asarray(rng.integers(-1, 2, n), jnp.int32)
    a = sample_texture_v3(plain, tex_idx, u, v)
    b = sample_texture_v3(kt, tex_idx, u, v)
    for ca, cb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_pyramid_builds_texkron_level():
    rng = np.random.default_rng(5)
    tex = rng.random((1, 1024, 1024, 3)).astype(np.float32)
    l0, l1 = build_quad_pyramid(tex)
    assert isinstance(l1, TexKron)
    assert l1.flat.shape == (1, SECONDARY_MIP, SECONDARY_MIP, 4)
    assert l1.t2.shape[0] == 3 * 4 * KRON_LO
    # tex_level routes levels: 0 -> plain, 1 -> kron
    assert tex_level((jnp.asarray(l0), l1), 0).shape == l0.shape
    assert isinstance(tex_level((jnp.asarray(l0), l1), 1), TexKron)
    # kron CPU fallback equals the flat table
    idx = jnp.asarray([0, 5, 16383], jnp.int32)
    got = kron_rows(TexKron(*(jnp.asarray(a) for a in l1)), idx)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(l1.flat).reshape(-1, 4)[np.asarray(idx)])
