"""Persistent XLA compilation cache.

The StylEx train step is a large program (two scan phases, second-order
path-length branch); cold compiles are expensive — especially through
remote-compile tunnels. Enabling JAX's persistent cache makes every process
after the first start instantly. Opt-out with STYLEX_TPU_NO_CACHE=1.
"""

from __future__ import annotations

import os

import jax

__all__ = ["enable_persistent_cache"]

_DEFAULT = os.path.expanduser("~/.cache/stylex_tpu_xla")


def enable_persistent_cache(path: str | None = None) -> bool:
    if os.environ.get("STYLEX_TPU_NO_CACHE"):
        return False
    try:
        # per-backend, per-host-CPU cache dir: entries AOT-compiled for one
        # machine profile must not be replayed on another (cpu_aot_loader
        # SIGILL hazard when remote-compiled CPU code lands on the host).
        import hashlib

        try:
            # flags alone are not enough: XLA derives LLVM tuning features
            # (e.g. prefer-no-scatter) from the CPU *model*, and two hosts
            # with identical flags lines can still produce incompatible AOT
            # entries (observed: cpu_aot_loader machine-feature mismatch
            # warnings of possible SIGILL). Hash flags + model name.
            sig_lines = []
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "model name")):
                        sig_lines.append(line)
                        if len(sig_lines) == 2:
                            break
            host_sig = hashlib.sha1("".join(sig_lines).encode()).hexdigest()[:8]
        except Exception:
            # /proc/cpuinfo unreadable (macOS, restricted container): derive
            # the signature from platform facts instead of a shared literal —
            # a constant would make all such hosts share one dir on a synced
            # ~/.cache, reintroducing the cross-host AOT-replay hazard.
            import platform

            fallback = "|".join(
                (platform.machine(), platform.processor(), " ".join(os.uname()))
            )
            if not fallback.strip("| "):
                return False  # no host identity derivable: safer to skip
            host_sig = hashlib.sha1(fallback.encode()).hexdigest()[:8]
        base = path or _DEFAULT
        full = os.path.join(base, f"{jax.default_backend()}-{host_sig}")
        os.makedirs(full, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", full)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
