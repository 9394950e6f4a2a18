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


_PROBE_ERR_MARKS = ("cpu_aot_loader", "Machine type used for XLA:CPU",
                    "SIGILL", "sigill")


def _probe_load(path: str) -> bool:
    """Round-trip a tiny probe entry through the cache dir and report whether
    the DISK LOAD was clean.

    The identity key can still miss (round 3: the driver host produced the
    exact ``cpu_aot_loader.cc`` feature-mismatch spam the key was built to
    kill). The only oracle that cannot miss is XLA's own loader: compile a
    probe, drop the in-memory cache so the next call must deserialize from
    disk, and capture native stderr (fd 2 — the C++ LOG(ERROR) stream)
    across both calls. Any loader complaint means entries in this dir are
    wrong for this host. Benign captured lines are replayed; loader noise is
    swallowed (the caller reports the condition once, concisely).
    """
    import sys
    import tempfile

    import jax
    import jax.numpy as jnp

    def run():
        x = jnp.arange(16.0).reshape(4, 4)
        jax.jit(lambda x: jnp.dot(x, x) + 1.0)(x).block_until_ready()

    cap = tempfile.TemporaryFile()
    sys.stderr.flush()
    old = os.dup(2)
    os.dup2(cap.fileno(), 2)
    try:
        run()                  # writes the entry (or loads a pre-existing one)
        jax.clear_caches()     # force the next call to deserialize from disk
        run()
    finally:
        sys.stderr.flush()
        os.dup2(old, 2)
        os.close(old)
    cap.seek(0)
    err = cap.read().decode(errors="replace")
    noisy = [l for l in err.splitlines(True)
             if any(m in l for m in _PROBE_ERR_MARKS)]
    benign = [l for l in err.splitlines(True) if l not in noisy]
    if benign:
        sys.stderr.write("".join(benign))
    return not noisy


def _reset_cache_singleton():
    """Drop jax's initialized compilation-cache object so a config change
    (new dir / disabled) actually takes effect mid-process."""
    try:
        from jax._src import compilation_cache

        compilation_cache.reset_cache()
    except Exception:
        pass


def setup_cpu_cache(min_compile_secs: float = 1.0, probe: bool = True) -> str | None:
    """Point jax's persistent compilation cache at the host-keyed CPU dir.

    With ``probe=True`` (default), validate the dir with a load-failure
    fallback (VERDICT r3 #7):

    1. probe-reload an entry through the dir; on loader errors, wipe the dir
       and reseed (stale/foreign entries);
    2. if even a freshly self-written entry fails to reload — true on hosts
       where LLVM adds tuning pseudo-features (``+prefer-no-scatter/gather``)
       to the compile feature set that XLA's AOT loader then rejects against
       its *host* feature set, so the cache can NEVER hit — disable the
       persistent cache for this process entirely. No load attempts, no
       spam, and nothing is lost: every load was already a recompile.

    Returns the cache dir, or None when the cache had to be disabled.
    A cache may make a run slower, never wrong or noisy.
    """
    import jax

    path = cpu_cache_dir()
    jax.config.update("jax_compilation_cache_dir", path)
    # probe entries must be persisted regardless of their compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if probe:
        ok = _probe_load(path)
        if not ok:
            shutil.rmtree(path, ignore_errors=True)
            path = cpu_cache_dir()  # recreates dir + identity marker
            jax.clear_caches()
            ok = _probe_load(path)  # reseed + revalidate a fresh entry
        if not ok:
            jax.config.update("jax_compilation_cache_dir", None)
            _reset_cache_singleton()  # else writes keep targeting the old dir
            shutil.rmtree(path, ignore_errors=True)
            print("[cpu_cache] XLA:CPU AOT loader rejects self-written "
                  "entries on this host (LLVM tuning-feature mismatch); "
                  "persistent CPU compile cache disabled for this process")
            return None
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
