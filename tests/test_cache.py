"""Persistent-cache host signature.

A host migration showed /proc/cpuinfo *flags* alone under-determine the
XLA:CPU AOT machine profile (LLVM tuning features like prefer-no-scatter
derive from the CPU model): two hosts with identical flags lines produced
incompatible AOT entries (cpu_aot_loader SIGILL warnings). The cache dir
signature therefore hashes flags + model name, and must change when either
changes.
"""

import jax

from stylex_tpu.utils.cache import enable_persistent_cache


def test_cache_dir_is_backend_and_host_scoped(tmp_path):
    # enable_persistent_cache mutates three process-wide configs; snapshot
    # and restore all of them so nothing leaks into other tests.
    prior = {
        name: getattr(jax.config, name)
        for name in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }
    try:
        assert enable_persistent_cache(str(tmp_path))
        configured = jax.config.jax_compilation_cache_dir
        assert configured.startswith(str(tmp_path))
        leaf = configured[len(str(tmp_path)) :].lstrip("/")
        backend, _, sig = leaf.partition("-")
        assert backend == jax.default_backend()
        # 8-hex host signature (never a shared literal: even without
        # /proc/cpuinfo the fallback hashes platform facts, and with no
        # host identity at all the cache is skipped instead)
        assert len(sig) == 8 and int(sig, 16) >= 0
    finally:
        for name, value in prior.items():
            jax.config.update(name, value)


def test_cache_host_sig_without_cpuinfo(tmp_path, monkeypatch):
    """No /proc/cpuinfo (macOS, restricted containers): the signature must
    still be host-derived (hashed platform facts), never a shared literal."""
    import builtins

    real_open = builtins.open

    def deny_cpuinfo(path, *a, **k):
        if path == "/proc/cpuinfo":
            raise PermissionError(path)
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", deny_cpuinfo)
    prior = {
        name: getattr(jax.config, name)
        for name in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }
    try:
        assert enable_persistent_cache(str(tmp_path))
        leaf = jax.config.jax_compilation_cache_dir[len(str(tmp_path)) :].lstrip("/")
        _, _, sig = leaf.partition("-")
        assert sig != "unknown" and len(sig) == 8 and int(sig, 16) >= 0
    finally:
        for name, value in prior.items():
            jax.config.update(name, value)


def test_cache_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("STYLEX_TPU_NO_CACHE", "1")
    prior = jax.config.jax_compilation_cache_dir
    assert not enable_persistent_cache(str(tmp_path))
    assert jax.config.jax_compilation_cache_dir == prior
