"""webgpu_raytracer_tpu: a TPU-native progressive path-tracing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
kokutoupan/webgpu-raytracer (browser WebGPU path tracer): native C++ scene
compiler (OBJ/glTF, animation, skinning, BLAS/TLAS), vectorized stackless
path tracing on TPU, progressive accumulation + TAA post-processing,
offline recording, and distributed multi-chip / multi-host rendering.
"""

from .config import RenderConfig
from .models.native import NativeWorld
from .render.renderer import Renderer

__all__ = ["RenderConfig", "NativeWorld", "Renderer"]
__version__ = "0.1.0"
