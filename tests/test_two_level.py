"""Two-level culled Pallas sweep (interpret mode) vs the XLA reference.

The two-level path (`ops/pallas_dense._run2` + `ops/cluster_cull`) replaces
the reference's per-ray TLAS pointer chase (Raytracer.wgsl:496-528) with a
tile-cone broad phase + in-kernel per-lane sphere cull + sorted near-to-far
early exit. These tests run the REAL kernel body under
`pl.pallas_call(interpret=True)` on CPU, so a silent kernel regression (like
round 1's wrong-hit-under-jit bug) fails CI, not a human eyeball.

t tolerance is 2e-3: the CPU backend emulates the bf16x3 split dot with
different rounding than the MXU (measured max rel diff 1.2e-3 vs the f32
reference on CPU; exact-match on TPU).

The scaled-direction case guards the t-unit/world-unit contract: primary
camera rays are unnormalized (|d| ~ focus_dist), which round 2 briefly broke
via reach-key comparisons in world units against t_max in ray-parameter
units (brightening `spheres` 0.0425 -> 0.0538 mean radiance).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from webgpu_raytracer_tpu.models.native import NativeWorld
from webgpu_raytracer_tpu.ops.dense import dense_closest, dense_shadow
from webgpu_raytracer_tpu.ops.pallas_dense import _run2
from webgpu_raytracer_tpu.ops.tune import TuneConfig
from webgpu_raytracer_tpu.render.worldtris import build_world_tris


def _grid_world(n=13):
    """A bumpy (n-1)^2*2-triangle grid -> multi-tile WorldTris."""
    verts, faces = [], []
    for j in range(n):
        for i in range(n):
            verts.append((i / (n - 1) * 2 - 1, ((i * 7 + j * 3) % 5) * 0.1,
                          j / (n - 1) * 2 - 1))
    for j in range(n - 1):
        for i in range(n - 1):
            a = j * n + i + 1
            faces.append((a, a + 1, a + n))
            faces.append((a + 1, a + n + 1, a + n))
    obj = "".join(f"v {x} {y} {z}\n" for x, y, z in verts) + \
          "".join(f"f {a} {b} {c}\n" for a, b, c in faces)
    world = NativeWorld("viewer", obj_source=obj)
    world.update_camera(64, 64)
    return world


TUNE = TuneConfig(m_tile2=512)  # several ray tiles at R=2048


@pytest.fixture(scope="module")
def grid_wt():
    wt = build_world_tris(_grid_world())
    assert wt.featk3.shape[0] > 1, "fixture must be multi-tile"
    return wt


def _rays(R=2048):
    rng = np.random.default_rng(1)
    ro = tuple(jnp.asarray(rng.normal(size=R) * 0.5, jnp.float32)
               for _ in range(3))
    rd = tuple(jnp.asarray(rng.normal(size=R), jnp.float32)
               for _ in range(3))
    act = jnp.arange(R) % 7 != 0                      # some inactive lanes
    tmax = jnp.where(jnp.arange(R) % 5 == 0, 2.0, 1e30)  # some bounded
    return ro, rd, act, tmax


def test_two_level_closest_row_shadow_match_reference(grid_wt):
    wt = grid_wt
    ro, rd, act, tmax = _rays()
    ro_rows = jnp.stack(ro, axis=1)
    rd_rows = jnp.stack(rd, axis=1)
    t_ref, i_ref = dense_closest(wt, ro_rows, rd_rows, t_max=tmax, active=act)

    t2, i2, row2 = _run2(wt, ro, rd, tmax, act, 1e-3, False, True,
                         interpret=True, tune=TUNE)
    t2, i2 = np.asarray(t2), np.asarray(i2)
    t_ref, i_ref = np.asarray(t_ref), np.asarray(i_ref)
    hit = i_ref >= 0
    assert ((i2 >= 0) == hit).all()
    assert (i_ref[hit] == i2[hit]).all()
    np.testing.assert_allclose(t2[hit], t_ref[hit], rtol=2e-3, atol=2e-4)

    # winner rows reproduce the shade table bit-for-bat on v0/e1/e2 columns
    st = np.asarray(wt.shade_table)
    row2 = np.asarray(row2)
    np.testing.assert_allclose(row2[0:9, hit].T, st[i2[hit]][:, 0:9],
                               rtol=1e-6, atol=1e-6)

    occ_ref = np.asarray(dense_shadow(wt, ro_rows, rd_rows, t_max=tmax,
                                      active=act))
    occ2 = np.asarray(_run2(wt, ro, rd, tmax, act, 1e-3, True, False,
                            interpret=True, tune=TUNE))
    assert (occ_ref == occ2).all()


def test_two_level_unnormalized_directions(grid_wt):
    """|d| = 10 rays: reach keys (world units) vs t_max (t units)."""
    wt = grid_wt
    ro, rd, act, tmax = _rays()
    rd_s = tuple(r * 10.0 for r in rd)
    t_ref, i_ref = dense_closest(wt, jnp.stack(ro, axis=1),
                                 jnp.stack(rd_s, axis=1), t_max=tmax,
                                 active=act)
    t2, i2, _ = _run2(wt, ro, rd_s, tmax, act, 1e-3, False, True,
                      interpret=True, tune=TUNE)
    t2, i2 = np.asarray(t2), np.asarray(i2)
    t_ref, i_ref = np.asarray(t_ref), np.asarray(i_ref)
    hit = i_ref >= 0
    assert ((i2 >= 0) == hit).all()
    assert (i_ref[hit] == i2[hit]).all()
    np.testing.assert_allclose(t2[hit], t_ref[hit], rtol=2e-3, atol=2e-4)
