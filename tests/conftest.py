"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; shardings are validated on a
virtual CPU mesh exactly as the driver's dryrun does.

Note: the environment presets JAX_PLATFORMS=axon (a remote single-TPU tunnel)
and the jaxtyping pytest plugin imports jax before this conftest runs, so we
must both override the env var and clear any already-initialized backends.
"""
import os
import sys

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
# key the CPU cache by the host's full CPU identity: this VM migrates across
# hosts, and XLA:CPU AOT entries embed LLVM tuning features derived from the
# CPU MODEL (not just the cpuinfo flags line) — loading a foreign entry
# SIGILLs or at best spams feature-mismatch errors (pbhc_tpu/utils/cpu_cache)
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
from pbhc_tpu.utils.cpu_cache import setup_cpu_cache  # noqa: E402

setup_cpu_cache(min_compile_secs=0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ref_motion_path():
    p = "/root/repo/assets/motions/Horse-stance_pose.pkl"
    if not os.path.exists(p):
        pytest.skip("reference motion data not available")
    return p
