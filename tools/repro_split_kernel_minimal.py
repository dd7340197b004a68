"""Minimal repro attempt: bf16-packed matmul pallas kernel inside fori loop."""
import sys; sys.path.insert(0,'/root/repo')
import functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 2048, 16, 640  # rays, features, 5*C columns

def split2(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo

def kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

def packed_mm(feat, rayT):
    fh, fl = split2(feat)      # (N, K)
    rh, rl = split2(rayT)      # (K, M)
    a = jnp.concatenate([fh, fh, fl], axis=1)   # (N, 3K)
    b = jnp.concatenate([rh, rl, rh], axis=0)   # (3K, M)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)

rng = np.random.default_rng(0)
feat = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))

def loop(rayT, n):
    def body(i, r):
        res = packed_mm(feat, r[:K] if r.shape[0]>K else r)
        # feed something ray-like back (keep shapes): derive new rayT rows
        newr = jnp.tanh(res[:K, :])  # (K, M)
        return newr
    return jax.lax.fori_loop(0, n, body, rayT)

ray0 = jnp.asarray(rng.normal(size=(K, M)).astype(np.float32))

# reference in f64-ish: same packed math via XLA dots
def packed_mm_xla(feat, rayT):
    fh, fl = split2(feat); rh, rl = split2(rayT)
    a = jnp.concatenate([fh, fh, fl], axis=1).astype(jnp.float32)
    b = jnp.concatenate([rh, rl, rh], axis=0).astype(jnp.float32)
    return a @ b

def loop_xla(rayT, n):
    def body(i, r):
        res = packed_mm_xla(feat, r)
        return jnp.tanh(res[:K, :])
    return jax.lax.fori_loop(0, n, body, rayT)

eager = loop(ray0, 4)
jitted = jax.jit(lambda r: loop(r, 4))(ray0)
ref = jax.jit(lambda r: loop_xla(r, 4))(ray0)
print("eager vs ref  max err:", float(jnp.abs(eager - ref).max()))
print("jit   vs ref  max err:", float(jnp.abs(jitted - ref).max()))
print("eager vs jit  max err:", float(jnp.abs(eager - jitted).max()))
