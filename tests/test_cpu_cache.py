"""Host-keyed CPU compile cache: probe-reload validation + wipe fallback.

Round-3 regression: the CPU-identity key alone did not stop
``cpu_aot_loader.cc`` feature-mismatch spam on the driver host; the fix is a
load-failure oracle — probe-reload through the dir and wipe on any loader
complaint (VERDICT r3 item 7).
"""
import os

import jax

from pbhc_tpu.utils import cpu_cache as cc


def _restore_cache_config():
    # conftest pointed the suite at the shared host-keyed dir; put it back
    cc.setup_cpu_cache(min_compile_secs=0.5, probe=False)


def test_setup_never_leaves_a_noisy_cache(tmp_path, monkeypatch):
    """The invariant (VERDICT r3 #7 'clean tail'): after setup, EITHER the
    cache is enabled and self-written entries reload cleanly, OR the cache is
    disabled (hosts where the XLA:CPU AOT loader rejects its own output over
    LLVM tuning pseudo-features — observed live on this VM's CPU)."""
    orig = cc.cpu_cache_dir
    monkeypatch.setattr(cc, "cpu_cache_dir",
                        lambda base=None: orig(str(tmp_path / "cache")))
    try:
        path = cc.setup_cpu_cache(min_compile_secs=0.5, probe=True)
        import jax

        if path is None:
            assert jax.config.jax_compilation_cache_dir is None
            # disabled => the poisoned dir is gone too
            assert not any(tmp_path.glob("cache_*/*"))
        else:
            assert path.startswith(str(tmp_path / "cache"))
            assert os.path.exists(os.path.join(path, "HOST_IDENT"))
            assert cc._probe_load(path)
    finally:
        _restore_cache_config()


def test_setup_wipes_dir_on_probe_failure(tmp_path, monkeypatch):
    orig = cc.cpu_cache_dir
    monkeypatch.setattr(cc, "cpu_cache_dir",
                        lambda base=None: orig(str(tmp_path / "cache")))
    junk_holder = {}

    def fake_probe(path):
        # first call: claim the dir is poisoned; later calls: clean
        if not junk_holder.get("wiped"):
            junk_holder["wiped"] = True
            return False
        junk_holder["revalidated"] = True
        return True

    monkeypatch.setattr(cc, "_probe_load", fake_probe)
    try:
        path = orig(str(tmp_path / "cache"))
        junk = os.path.join(path, "foreign_entry")
        with open(junk, "wb") as f:
            f.write(b"\x00" * 64)
        got = cc.setup_cpu_cache(min_compile_secs=0.5, probe=True)
        assert got == path, "wipe+reseed succeeded: cache stays enabled"
        assert not os.path.exists(junk), "poisoned dir must be wiped"
        assert junk_holder.get("revalidated"), "fresh probe entry must be seeded"
        assert os.path.exists(os.path.join(path, "HOST_IDENT"))
    finally:
        _restore_cache_config()


def test_identity_marker_mismatch_wipes(tmp_path):
    path = cc.cpu_cache_dir(str(tmp_path / "c"))
    stale = os.path.join(path, "stale")
    open(stale, "w").close()
    with open(os.path.join(path, "HOST_IDENT"), "w") as f:
        f.write("some other host entirely")
    path2 = cc.cpu_cache_dir(str(tmp_path / "c"))
    assert path2 == path
    assert not os.path.exists(stale)
