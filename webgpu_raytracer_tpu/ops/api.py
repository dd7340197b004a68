"""Backend dispatch: dense (MXU matmul sweep) vs bvh (masked skip-walk).

`dense` is the TPU hot path for scenes up to ~16k world triangles (all
presets except `spheres`); `bvh` is the general path for large scenes.
Both produce the same estimator with the same per-(pixel, frame, sample)
RNG streams.
"""

from __future__ import annotations

from .dense_trace import trace_pixels_dense
from .trace import trace_pixels

DENSE_MAX_TRIS = 16384


def choose_backend(world_tri_count: int) -> str:
    """On TPU the dense backend covers large scenes too: the two-level
    culled sweep (ops/pallas_dense._run2) renders the 257k-tri `spheres`
    at ~0.93 s/frame (512p d8) vs ~15 s for the masked BVH walk. Off-TPU
    (tests, CPU fallbacks) large scenes keep the BVH path — the chunked XLA
    dense sweep is O(rays x tris) without the Pallas cull."""
    from .dense_trace import _use_pallas

    if _use_pallas():
        return "dense"
    return "dense" if world_tri_count <= DENSE_MAX_TRIS else "bvh"


def get_tracer(backend: str):
    """Returns tracer(scene, camera, frame_count, jitter, width, height,
    spp, max_depth, **shard_offsets).

    For `dense`, scene is the pytree (WorldTris, textures); for `bvh` it is a
    DeviceScene.
    """
    if backend == "dense":
        def tracer(scene, *args, **kwargs):
            wt, textures = scene
            return trace_pixels_dense(wt, textures, *args, **kwargs)
        return tracer
    if backend == "bvh":
        return trace_pixels
    raise ValueError(f"unknown backend {backend!r}")
