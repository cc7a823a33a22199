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


def test_cache_dir_is_backend_and_host_scoped(tmp_path, monkeypatch):
    prior = jax.config.jax_compilation_cache_dir
    try:
        assert enable_persistent_cache(str(tmp_path))
        configured = jax.config.jax_compilation_cache_dir
        assert configured.startswith(str(tmp_path))
        leaf = configured[len(str(tmp_path)) :].lstrip("/")
        backend, _, sig = leaf.partition("-")
        assert backend == jax.default_backend()
        # 8-hex host signature (or the explicit unknown fallback)
        assert sig == "unknown" or (len(sig) == 8 and int(sig, 16) >= 0)
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)


def test_cache_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("STYLEX_TPU_NO_CACHE", "1")
    prior = jax.config.jax_compilation_cache_dir
    assert not enable_persistent_cache(str(tmp_path))
    assert jax.config.jax_compilation_cache_dir == prior
