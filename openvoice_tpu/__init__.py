"""OpenVoice-TPU: a TPU-native (JAX/XLA/Pallas) zero-shot voice-cloning framework.

Capability parity target: myshell-ai/OpenVoice (see /root/repo/SURVEY.md).
Architecture is TPU-first: functional models over parameter pytrees, jit-compiled
graphs per length bucket, `jax.sharding` meshes for scale-out, Pallas kernels for
the hot ops. Nothing here is a translation of the reference's torch code.
"""

__version__ = "0.1.0"

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
