"""Persistent XLA compilation cache for the CLIs.

The full-model jit costs 20-40 s to compile on TPU (1-5 min on CPU); the
programs are deterministic functions of (spec, shapes, flags), so reruns
of the same config recompile the exact same executables. JAX's persistent
compilation cache skips that: enable it and the second run of any CLI
starts serving/training in seconds.

Opt-in (the reference has no analogous knob, and always-on would write to
the user's home from tests/CI): pass ``compilation_cache: true`` (default
dir ``~/.cache/yolov3_tpu/xla``) or ``compilation_cache: /some/dir`` in
any run config, or set ``YOLOV3_TPU_COMPILE_CACHE=<dir|1>`` in the
environment (the env var also covers bench/tools).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/yolov3_tpu/xla")

_DISABLE = {"0", "false", "no", "off"}
_ENABLE_DEFAULT = {"1", "true", "yes", "on"}


def enable_compilation_cache(value=True) -> str | None:
    """Enable JAX's persistent compilation cache.

    ``value``: True / "1"-like → default dir; any other string → that
    directory; False/None/"off"-like → no-op. Returns the cache dir in
    use (or None). Idempotent; later calls with a different dir re-point
    the cache.
    """
    if value is False or value is None:
        return None
    if isinstance(value, str) and value.strip().lower() in _DISABLE | {""}:
        return None
    if value is True or (isinstance(value, str) and value.strip().lower() in _ENABLE_DEFAULT):
        path = DEFAULT_DIR
    else:
        path = str(value)
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)

    import jax

    if jax.config.jax_compilation_cache_dir not in (None, path):
        # the persistent cache object is initialized once at first use; a
        # later dir change silently keeps writing to the old one without
        # this reset
        from jax.experimental.compilation_cache import compilation_cache

        compilation_cache.reset_cache()
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program, not just slow-to-compile ones: the point is CLI
    # rerun latency, and even "fast" CPU compiles of the small tiers are
    # seconds
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def enable_from_env_or_config(config_value=None) -> str | None:
    """Apps call this once at startup: config key wins, env is fallback."""
    if config_value is not None:
        return enable_compilation_cache(config_value)
    env = os.environ.get("YOLOV3_TPU_COMPILE_CACHE")
    if env:
        return enable_compilation_cache(env)
    return None
