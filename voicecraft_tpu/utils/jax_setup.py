"""JAX runtime setup shared by CLIs: persistent compilation cache + platform
override (the axon TPU plugin in some images prepends itself to jax_platforms
even when JAX_PLATFORMS=cpu is exported)."""

import os


def setup(platform: str | None = None, compile_cache: bool | None = None) -> None:
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    # The persistent compilation cache hangs compilation on the experimental
    # axon tunnel backend — enable only when explicitly requested via env.
    if compile_cache is None:
        compile_cache = "VOICECRAFT_TPU_CACHE" in os.environ
    if compile_cache:
        cache_dir = os.environ.get(
            "VOICECRAFT_TPU_CACHE",
            os.path.expanduser("~/.cache/voicecraft_tpu/jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
