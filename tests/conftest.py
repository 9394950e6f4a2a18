"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; shardings are validated on a
virtual CPU mesh exactly as the driver's dryrun does.

Note: the environment presets JAX_PLATFORMS=axon (a remote single-TPU tunnel)
and the jaxtyping pytest plugin imports jax before this conftest runs, so we
must both override the env var and clear any already-initialized backends.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the axon remote-compile service produces CPU AOT executables with the
# REMOTE machine's feature set (+prefer-no-gather etc.); loading them on this
# host SIGILLs/segfaults mid-suite. Never remote-compile in tests, and keep a
# CPU-only cache dir so entries from TPU-attached processes are never loaded.
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
# the real gate for remote compiles is the pool address; while it is set even
# "CPU-only" compiles route to the remote service (tools/run_tests.sh unsets
# it before python starts — this pop is defense-in-depth for bare pytest runs)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.clear_backends()
except Exception:
    import jax._src.xla_bridge as xb  # pragma: no cover

    xb._clear_backends()
# key the CPU cache by the host's CPU feature set: this VM migrates across
# hosts (amx/avx512 present on some, absent on others), and XLA:CPU AOT
# entries compiled on a richer host SIGILL when loaded on a poorer one
import hashlib  # noqa: E402

def _cpu_fingerprint():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "unknown"

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_cache_cpu_{_cpu_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ref_motion_path():
    p = "/root/repo/assets/motions/Horse-stance_pose.pkl"
    if not os.path.exists(p):
        pytest.skip("reference motion data not available")
    return p
