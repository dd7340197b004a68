"""Repo-root conftest: environment repair before JAX initializes.

Loaded by pytest before test collection. See tests/conftest.py for why the
re-exec is needed (host sitecustomize pre-initializes JAX's backends).
"""
import os
import sys

_pp = os.environ.get("PYTHONPATH", "")
if ("axon_site" in _pp or not _pp) and \
        os.environ.get("WRT_CONFTEST_REEXEC") != "1":
    repo_root = os.path.dirname(os.path.abspath(__file__))
    kept = [p for p in _pp.split(os.pathsep) if p and "axon_site" not in p]
    os.environ["PYTHONPATH"] = os.pathsep.join(kept + [repo_root])
    os.environ["WRT_CONFTEST_REEXEC"] = "1"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # Persistent compilation cache (keyed on HLO hash, so code changes
    # recompile): most of the suite's wall time is XLA compiles on the
    # single-core CI host; repeat runs become execution-only.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(repo_root, ".cache", "jax"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    argv = getattr(sys, "orig_argv", None)
    if argv:
        # restore pytest's early fd capture before replacing the process so
        # the child's output reaches the real stdout/stderr
        try:
            import _pytest.capture as _cap
            cm = getattr(_cap, "_global_capturing", None)
            if cm is not None:
                cm.stop_global_capturing()
        except Exception:
            pass
        sys.stdout.flush()
        sys.stderr.flush()
        os.execv(sys.executable, [sys.executable] + list(argv[1:]))
