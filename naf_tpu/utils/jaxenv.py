"""JAX environment setup shared by the CLIs and benchmarks.

Enables the persistent compilation cache so repeated CLI invocations don't
pay the (remote) TPU compile latency for the fixed set of bucketed kernel
shapes.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    env_dir = os.environ.get("NAF_TPU_JAX_CACHE")
    if env_dir == "":
        return                            # cache explicitly disabled
    cache_dir = cache_dir or env_dir or os.path.expanduser(
        "~/.cache/naf_tpu_jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass  # cache is best-effort


def quiet_device_logs() -> None:
    """Silence jax/XLA startup chatter on stderr (CLI --device paths).

    The reference CLIs' stderr is a byte-exact contract (the golden suite
    diffs it); the axon plugin's experimental-platform warning and XLA's
    cpu_aot_loader machine-feature notes would otherwise pollute it.
    Must run BEFORE the first jax import (glog reads its env at load).
    """
    import logging
    import os

    os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
    # glog/absl C++ severities (the cpu_aot_loader machine-feature notes
    # log at ERROR); 3 = FATAL-only for both spellings.  NOTE: sitecustomize
    # imports jaxlib at interpreter start, so the C++ latch may already be
    # set — the cache redirect below removes the E-source itself.
    os.environ["ABSL_MIN_LOG_LEVEL"] = "3"
    os.environ["GLOG_minloglevel"] = "3"
    for name in ("jax._src.xla_bridge", "jax._src.compiler", "jax"):
        logging.getLogger(name).setLevel(logging.ERROR)
    if os.environ.get("JAX_PLATFORM_NAME") == "cpu":
        # CPU-mode CLI (virtual-mesh tests): XLA:CPU's AOT cache on this
        # image writes entries its own loader then rejects (pseudo-feature
        # +prefer-no-scatter mismatch), logging C++ ERROR lines straight
        # onto the golden stderr on EVERY load — and a failed load means
        # the cache never helps anyway.  Disable it for CPU-mode CLIs.
        os.environ["NAF_TPU_JAX_CACHE"] = ""
        # a parent process' sitecustomize may export JAX_PLATFORMS=axon
        # without the child inheriting the plugin REGISTRATION (e.g. the
        # test harness clears PYTHONPATH): force the requested platform
        # the supported way (config wins over the env pin)
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
