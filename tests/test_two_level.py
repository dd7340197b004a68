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
from webgpu_raytracer_tpu.ops.pallas_dense import _run2, _run3
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


# --- Drain-shape matrix -----------------------------------------------------
# The survivor loop's queue/drain machinery has produced two silent
# wrong-image bugs (commits 513ab41: short-drain zeroing killed REAL queued
# clusters at proc_batch=4 nv in {2,3}; 3395142: the windowed epilogue's
# one-hot row fetch contracted over uninitialized-NaN shade positions on
# partial first drains). Interpret mode initializes float VMEM scratch to
# NaN (jax pallas primitives.uninitialized_value), so BOTH reproduce here
# when their fixes are reverted: this matrix pins every TuneConfig drain
# shape to bit-identical outputs on a multi-tile scene whose per-tile
# processed counts cover every nv mod proc_batch residue.

_DRAIN_VARIANTS = [
    TuneConfig(m_tile2=512, proc_batch=1, scan_batch=1),
    TuneConfig(m_tile2=512, proc_batch=2, scan_batch=1),
    TuneConfig(m_tile2=512, proc_batch=4, scan_batch=1),
    TuneConfig(m_tile2=512, proc_batch=4, scan_batch=2),
    TuneConfig(m_tile2=512, proc_batch=2, scan_batch=2, debug2="allwin"),
    TuneConfig(m_tile2=512, proc_batch=4, scan_batch=2, debug2="allwin"),
]


@pytest.fixture(scope="module")
def drain_world():
    """A larger grid (21 clusters) + rays tuned so the 5 ray tiles' dynamic
    processed counts land on distinct nv mod 4 residues (asserted below):
    two origin camps (the coherence sort separates them), mostly-downward
    directions, quarters of dead / tightly-bounded / medium / unbounded
    lanes. Seed chosen by scan: nproc = [17, 18, 17, 15, 0]."""
    wt = build_world_tris(_grid_world(n=37))
    assert wt.featk3.shape[0] >= 16, "need a deep worklist per tile"
    rng = np.random.default_rng(2)
    R = 2560
    ro = np.zeros((3, R))
    rd = np.zeros((3, R))
    a, b = 1536, 2048
    # population A: random rays in the bump field (varied culls)
    ro[:, :a] = rng.normal(size=(3, a)) * 0.3
    rd[:, :a] = rng.normal(size=(3, a))
    rd[1, :a] = -np.abs(rd[1, :a]) * (0.5 + rng.random(a))
    # population B: spread straight-down from high above (every cluster
    # wins lanes -> drained clusters carry hits)
    ro[0, a:b] = rng.uniform(-1, 1, b - a)
    ro[1, a:b] = 2.0
    ro[2, a:b] = rng.uniform(-1, 1, b - a)
    rd[0, a:b] = rng.normal(size=b - a) * 0.05
    rd[1, a:b] = -1.0
    rd[2, a:b] = rng.normal(size=b - a) * 0.05
    # population C: low above one corner patch -> a tile with nproc=7,
    # whose final nv=3 drain lands in a VIRGIN queue slot (positions past
    # nv read uninitialized VMEM = NaN under interpret mode)
    ro[0, b:] = rng.uniform(0.55, 1.0, R - b)
    ro[1, b:] = 1.2
    ro[2, b:] = rng.uniform(0.55, 1.0, R - b)
    rd[0, b:] = rng.normal(size=R - b) * 0.03
    rd[1, b:] = -1.0
    rd[2, b:] = rng.normal(size=R - b) * 0.03
    lane = np.arange(R)
    act = jnp.asarray(lane % 7 != 0)
    tmax = jnp.asarray(np.where(lane % 5 == 0, 0.9,
                                np.where(lane % 5 == 2, 1.6, 1e30)),
                       jnp.float32)
    ro = tuple(jnp.asarray(ro[i], jnp.float32) for i in range(3))
    rd = tuple(jnp.asarray(rd[i], jnp.float32) for i in range(3))
    return wt, ro, rd, act, tmax


def _ladder_world():
    """6 well-separated 9x9-vertex patches (128 tris each) strung along x
    at 3-unit spacing, in the viewer preset (+12 env tris) = 780 world
    tris = 7 BLAS clusters. With the ladder RAYS below (64 lanes straight
    down above each patch, at increasing altitude), every lane's winning
    triangle lies directly under it in exactly one cluster — so EVERY
    cluster that survives the cull commits wins when processed, including
    the clusters of the final PARTIAL drain batch (nproc = 7 < queue
    depth: the drain lands in a virgin queue slot). That is the trigger
    both round-4 drain bugs required: stale/virgin queue positions only
    corrupt output when a short drain actually updates lanes (commits
    513ab41, 3395142)."""
    verts, faces = [], []
    for k in range(6):
        base = len(verts)
        for j in range(9):
            for i in range(9):
                verts.append((3 * k - 0.5 + i / 8.0,
                              0.01 * ((i + j + k) % 3),
                              -0.5 + j / 8.0))
        for j in range(8):
            for i in range(8):
                a = base + j * 9 + i + 1
                faces.append((a, a + 1, a + 9))
                faces.append((a + 1, a + 10, a + 9))
    obj = "".join(f"v {x} {y} {z}\n" for x, y, z in verts) + \
          "".join(f"f {a} {b} {c}\n" for a, b, c in faces)
    world = NativeWorld("viewer", obj_source=obj)
    world.update_camera(64, 64)
    return world


@pytest.fixture(scope="module")
def ladder_world():
    wt = build_world_tris(_ladder_world())
    assert wt.featk3.shape[0] == 7, wt.featk3.shape
    # The viewer preset's t=0 model transform (spin + breathe), measured:
    # world = 0.7 * R_y(pi) * p + (0, 0.7, 0). Lanes go above the
    # TRANSFORMED patch centers x_w = -2.1k.
    R = 512
    ro = np.zeros((3, R))
    rd = np.zeros((3, R))
    for k in range(6):
        s = k * 64
        gx, gz = np.meshgrid(np.linspace(-0.3, 0.3, 8),
                             np.linspace(-0.3, 0.3, 8))
        ro[0, s:s + 64] = -2.1 * k + gx.ravel()
        ro[1, s:s + 64] = 2.0 + 2.1 * k
        ro[2, s:s + 64] = gz.ravel()
    ro[0, 384:] = 5.0       # dead lanes parked right of everything
    ro[1, 384:] = 1.0
    rd[1, :] = -1.0
    act = jnp.asarray(np.arange(R) < 384)   # last 128 lanes dead
    tmax = jnp.full((R,), 1e30, jnp.float32)
    ro = tuple(jnp.asarray(ro[i], jnp.float32) for i in range(3))
    rd = tuple(jnp.asarray(rd[i], jnp.float32) for i in range(3))
    return wt, ro, rd, act, tmax


@pytest.fixture(scope="module")
def ladder_ref(ladder_world):
    wt, ro, rd, act, tmax = ladder_world
    t0, i0, row0, stats = _run2(wt, ro, rd, tmax, act, 1e-3, False, True,
                                interpret=True, with_stats=True,
                                tune=_DRAIN_VARIANTS[0])
    nproc = np.asarray(stats)[:, 1].astype(int)
    assert list(nproc) == [7], f"nproc={nproc}"     # 7 = one partial drain
    i0 = np.asarray(i0)
    # every cluster must win lanes (the commit-at-drain precondition)
    assert set(i0[i0 >= 0] // 128) == set(range(7)), set(i0[i0 >= 0] // 128)
    return np.asarray(t0), i0, np.asarray(row0)


@pytest.mark.parametrize("tune", _DRAIN_VARIANTS[1:],
                         ids=[f"pb{t.proc_batch}_sb{t.scan_batch}"
                              + ("_allwin" if t.debug2 else "")
                              for t in _DRAIN_VARIANTS[1:]])
def test_ladder_drain_commits_bit_identical(ladder_world, ladder_ref, tune):
    wt, ro, rd, act, tmax = ladder_world
    t0, i0, row0 = ladder_ref
    t1, i1, row1 = _run2(wt, ro, rd, tmax, act, 1e-3, False, True,
                         interpret=True, tune=tune)
    np.testing.assert_array_equal(i0, np.asarray(i1))
    np.testing.assert_array_equal(t0, np.asarray(t1))
    np.testing.assert_array_equal(row0, np.asarray(row1))


@pytest.fixture(scope="module")
def drain_ref(drain_world):
    """Reference outputs from the simplest drain shape (pb1/sb1), plus the
    coverage guard: the tiles' processed counts must exercise every
    final-drain residue mod 4 (else the matrix can't catch a drain bug).
    If geometry/ray edits break this, re-tune the fixture seed."""
    wt, ro, rd, act, tmax = drain_world
    t0, i0, row0, stats = _run2(wt, ro, rd, tmax, act, 1e-3, False, True,
                                interpret=True, with_stats=True,
                                tune=_DRAIN_VARIANTS[0])
    nproc = np.asarray(stats)[:, 1].astype(int)
    assert set(nproc % 4) == {0, 1, 2, 3}, f"nproc={nproc}"
    assert (nproc >= 9).sum() >= 2, f"need queue wrap, nproc={nproc}"
    assert any(0 < p < 8 and p % 4 in (1, 2, 3) for p in nproc), (
        f"need a virgin-slot partial drain, nproc={nproc}")
    return np.asarray(t0), np.asarray(i0), np.asarray(row0)


@pytest.mark.parametrize("tune", _DRAIN_VARIANTS[1:],
                         ids=[f"pb{t.proc_batch}_sb{t.scan_batch}"
                              + ("_allwin" if t.debug2 else "")
                              for t in _DRAIN_VARIANTS[1:]])
def test_drain_shapes_bit_identical(drain_world, drain_ref, tune):
    wt, ro, rd, act, tmax = drain_world
    t0, i0, row0 = drain_ref
    t1, i1, row1 = _run2(wt, ro, rd, tmax, act, 1e-3, False, True,
                         interpret=True, tune=tune)
    np.testing.assert_array_equal(i0, np.asarray(i1))
    np.testing.assert_array_equal(t0, np.asarray(t1))
    np.testing.assert_array_equal(row0, np.asarray(row1))


# --- Job-stream narrow phase (_run3, tune.narrow="jobs") --------------------
# Same contract as _run2 at finer group granularity with no in-kernel cull;
# the variants sweep drain shapes (partial final batches, queue wrap) and
# both group sizes.

_JOBS_VARIANTS = [
    TuneConfig(narrow="jobs", m_tile3=128, proc_batch=1),
    TuneConfig(narrow="jobs", m_tile3=128, proc_batch=2),
    TuneConfig(narrow="jobs", m_tile3=128, proc_batch=4),
    TuneConfig(narrow="jobs", m_tile3=256, proc_batch=4),
    TuneConfig(narrow="jobs", m_tile3=128, proc_batch=2, prefetch_depth=4),
    TuneConfig(narrow="jobs", m_tile3=128, seed_k=4),
    TuneConfig(narrow="jobs", m_tile3=128, cull_sub=8),
    TuneConfig(narrow="jobs", m_tile3=128, seed_k=4, cull_sub=8),
]


def _jobs_id(t):
    return (f"g{t.m_tile3}_pb{t.proc_batch}_d{t.prefetch_depth}"
            + (f"_s{t.seed_k}" if t.seed_k else "")
            + (f"_c{t.cull_sub}" if t.cull_sub else ""))


@pytest.mark.parametrize("tune", _JOBS_VARIANTS,
                         ids=[_jobs_id(t) for t in _JOBS_VARIANTS])
def test_jobs_closest_row_shadow_match_reference(grid_wt, tune):
    wt = grid_wt
    ro, rd, act, tmax = _rays()
    t_ref, i_ref = dense_closest(wt, jnp.stack(ro, axis=1),
                                 jnp.stack(rd, axis=1), t_max=tmax,
                                 active=act)
    t3, i3, row3 = _run3(wt, ro, rd, tmax, act, 1e-3, False, True,
                         interpret=True, tune=tune)
    t3, i3 = np.asarray(t3), np.asarray(i3)
    t_ref, i_ref = np.asarray(t_ref), np.asarray(i_ref)
    hit = i_ref >= 0
    assert ((i3 >= 0) == hit).all()
    assert (i_ref[hit] == i3[hit]).all()
    np.testing.assert_allclose(t3[hit], t_ref[hit], rtol=2e-3, atol=2e-4)

    st = np.asarray(wt.shade_table)
    row3 = np.asarray(row3)
    np.testing.assert_allclose(row3[0:9, hit].T, st[i3[hit]][:, 0:9],
                               rtol=1e-6, atol=1e-6)

    occ_ref = np.asarray(dense_shadow(wt, jnp.stack(ro, axis=1),
                                      jnp.stack(rd, axis=1), t_max=tmax,
                                      active=act))
    occ3 = np.asarray(_run3(wt, ro, rd, tmax, act, 1e-3, True, False,
                            interpret=True, tune=tune))
    assert (occ_ref == occ3).all()


@pytest.mark.parametrize("tune", _JOBS_VARIANTS,
                         ids=[_jobs_id(t) for t in _JOBS_VARIANTS])
def test_jobs_ladder_matches_scan_kernel(ladder_world, ladder_ref, tune):
    """On the deterministic ladder fixture (every lane's winner sits in
    exactly one cluster — no cross-cluster ties) the job-stream kernel must
    reproduce the scan kernel bit-for-bit, including winner rows, across
    drain shapes: partial final batches land in virgin queue slots here
    exactly as in the _run2 drain matrix."""
    wt, ro, rd, act, tmax = ladder_world
    t0, i0, row0 = ladder_ref
    t1, i1, row1 = _run3(wt, ro, rd, tmax, act, 1e-3, False, True,
                         interpret=True, tune=tune)
    np.testing.assert_array_equal(i0, np.asarray(i1))
    np.testing.assert_array_equal(t0, np.asarray(t1))
    np.testing.assert_array_equal(row0, np.asarray(row1))


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
