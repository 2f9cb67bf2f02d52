"""OpenVoice-TPU: a TPU-native (JAX/XLA/Pallas) zero-shot voice-cloning framework.

Capability parity target: myshell-ai/OpenVoice (see /root/repo/SURVEY.md).
Architecture is TPU-first: functional models over parameter pytrees, jit-compiled
graphs per length bucket, `jax.sharding` meshes for scale-out, Pallas kernels for
the hot ops. Nothing here is a translation of the reference's torch code.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache, on by default.

    Full-size f32 graphs cost 30-50 s of XLA compile per length bucket; the
    cache makes every process after the first start in seconds.  Respects an
    explicit JAX_COMPILATION_CACHE_DIR / jax.config setting; opt out with
    OPENVOICE_TPU_NO_COMPILE_CACHE=1.
    """
    if _os.environ.get("OPENVOICE_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir or _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    cache = _os.path.join(
        _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache")),
        "openvoice_tpu", "jax_cache",
    )
    try:
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        pass  # read-only home or older jax: run without the cache


_enable_compile_cache()

from openvoice_tpu.config import HParams, load_hparams, SynthesizerConfig  # noqa: F401

__all__ = [
    "HParams",
    "SynthesizerConfig",
    "load_hparams",
    "BaseSpeakerTTS",
    "ToneColorConverter",
]


def __getattr__(name: str):
    # lazy: importing the package shouldn't pull in jax-compiled modules
    if name in ("BaseSpeakerTTS", "ToneColorConverter"):
        from openvoice_tpu import api

        return getattr(api, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
