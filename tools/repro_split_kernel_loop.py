"""Repro attempt 2: the real WIP split kernel inside a fori loop, rays
derived from previous outputs, vs the safe HIGHEST kernel."""
import sys
sys.path.insert(0, '/tmp/wt_split')
import numpy as np, jax, jax.numpy as jnp
from webgpu_raytracer_tpu.models.native import NativeWorld
from webgpu_raytracer_tpu.render.worldtris import build_world_tris
import webgpu_raytracer_tpu.ops.pallas_dense as PD

world = NativeWorld('cornell')
wt = build_world_tris(world)
R = 1024
rng = np.random.default_rng(0)
ro0 = tuple(jnp.asarray(rng.uniform(-0.8,0.8,R).astype(np.float32)) for _ in range(3))
rd0 = rng.normal(size=(3,R)).astype(np.float32); rd0 /= np.linalg.norm(rd0,axis=0,keepdims=True)
rd0 = tuple(jnp.asarray(rd0[i]) for i in range(3))

def loop(ro, rd, n):
    def body(i, c):
        rox, roy, roz, rdx, rdy, rdz, acc = c
        t, idx, rowT = PD.pallas_closest_with_row(wt, (rox,roy,roz), (rdx,rdy,rdz))
        hit = idx >= 0
        # next ray: reflect-ish derived from row data
        nx, ny, nz = rowT[9], rowT[10], rowT[11]
        d = rdx*nx + rdy*ny + rdz*nz
        rdx2 = jnp.where(hit, rdx - 2*d*nx, rdx)
        rdy2 = jnp.where(hit, rdy - 2*d*ny, rdy)
        rdz2 = jnp.where(hit, rdz - 2*d*nz, rdz)
        l = jnp.sqrt(rdx2**2+rdy2**2+rdz2**2)
        rox2 = jnp.where(hit, rox + rdx*t*0.99, rox)
        roy2 = jnp.where(hit, roy + rdy*t*0.99, roy)
        roz2 = jnp.where(hit, roz + rdz*t*0.99, roz)
        return (rox2, roy2, roz2, rdx2/l, rdy2/l, rdz2/l, acc + t*hit)
    z = jnp.zeros(R)
    out = jax.lax.fori_loop(0, n, body, ro + rd + (z,))
    return out[6]

eager = np.asarray(loop(ro0, rd0, 4))
jitted = np.asarray(jax.jit(lambda ro, rd: loop(ro, rd, 4))(ro0, rd0))
print("eager vs jit max err:", np.abs(eager - jitted).max())
print("eager sum", eager.sum(), "jit sum", jitted.sum())
