"""Host-keyed XLA:CPU persistent compile cache (SURVEY §5.3 failure detection).

XLA:CPU AOT cache entries embed LLVM *target tuning* features — e.g.
``+prefer-no-gather``, a CPU-model-derived gather mitigation — that do NOT
appear in the /proc/cpuinfo ``flags`` line, so keying the cache dir by the
flags line alone (round 2) still let entries compiled on a different host be
loaded, spamming ``cpu_aot_loader.cc`` feature-mismatch errors ("could lead
to execution errors such as SIGILL"). Two hosts with identical flags can
differ in LLVM tuning, which is derived from the CPU *model*.

Fix: key the dir by the full CPU identity (model name / family / stepping +
flags) plus the jaxlib version, and self-validate with a marker file holding
the raw identity string — any mismatch (hash truncation collision, partial
/proc parse, migrated VM) wipes the dir and recompiles. A cache may make a
run slower, never wrong or noisy.
"""
from __future__ import annotations

import hashlib
import os
import shutil


def _cpu_identity() -> str:
    keys = ("model name", "cpu family", "model\t", "model:", "stepping", "flags")
    lines = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(keys):
                    lines.append(line.strip())
                if line.strip() == "" and lines:
                    break  # first core only — all cores are identical here
    except OSError:
        pass
    try:
        import jaxlib

        lines.append(f"jaxlib {jaxlib.__version__}")
    except Exception:
        pass
    return "\n".join(lines) or "unknown"


def cpu_cache_dir(base: str = "/tmp/jax_cache_cpu") -> str:
    """Identity-keyed cache dir, wiped if its marker disagrees with this host."""
    ident = _cpu_identity()
    path = f"{base}_{hashlib.md5(ident.encode()).hexdigest()[:10]}"
    marker = os.path.join(path, "HOST_IDENT")
    try:
        with open(marker) as f:
            if f.read() != ident:
                shutil.rmtree(path, ignore_errors=True)
    except OSError:
        pass
    os.makedirs(path, exist_ok=True)
    try:
        with open(marker, "w") as f:
            f.write(ident)
    except OSError:
        pass
    return path


def setup_cpu_cache(min_compile_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at the host-keyed CPU dir."""
    import jax

    path = cpu_cache_dir()
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
