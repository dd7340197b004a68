"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on virtual CPU devices
(xla_force_host_platform_device_count) since only one real TPU chip is
attached; the kernels are the same XLA programs either way.
"""

import os
import sys

# Force CPU unconditionally: the host shell exports JAX_PLATFORMS=axon (the
# real TPU), but tests must run on the virtual multi-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_world():
    from webgpu_raytracer_tpu.models.native import NativeWorld

    w = NativeWorld("cornell")
    w.update_camera(64, 64)
    return w


@pytest.fixture(scope="session")
def cornell_scene(cornell_world):
    from webgpu_raytracer_tpu.render.resources import build_device_scene

    return build_device_scene(cornell_world)


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(1234)
