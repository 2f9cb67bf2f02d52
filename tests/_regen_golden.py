"""Golden-fixture cases + regeneration entry point (tests/test_golden.py).

Run `python tests/_regen_golden.py` to rewrite tests/golden/*.npy after a
DELIBERATE numerics change; the commit message should say why the goldens
moved.
"""

from __future__ import annotations

import pathlib

import numpy as np

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"

_CONVERT_CFG = dict(
    n_speakers=0, zero_g=True,
    spec_channels=129, filter_length=256, hop_length=64, win_length=256,
    inter_channels=64, hidden_channels=64,
    upsample_initial_channel=128, upsample_rates=(4, 4),
    upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    gin_channels=64,
)

_TTS_CFG = dict(
    n_vocab=20, n_speakers=4, zero_g=False,
    spec_channels=129, filter_length=256, hop_length=64, win_length=256,
    inter_channels=64, hidden_channels=64, filter_channels=128, n_heads=2,
    n_layers=2, kernel_size=3, p_dropout=0.0,
    upsample_initial_channel=128, upsample_rates=(4, 4),
    upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    gin_channels=32,
)


def convert_case() -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from openvoice_tpu.config import SynthesizerConfig
    from openvoice_tpu.models import synthesizer as S

    cfg = SynthesizerConfig(**_CONVERT_CFG)
    params = S.init_synthesizer(jax.random.PRNGKey(123), cfg)
    rng = np.random.default_rng(77)
    t = 60
    spec = jnp.asarray(
        np.abs(rng.standard_normal((1, t, cfg.spec_channels))).astype(np.float32)
    )
    g_s = jnp.asarray(rng.standard_normal((1, 1, cfg.gin_channels)).astype(np.float32))
    g_t = jnp.asarray(rng.standard_normal((1, 1, cfg.gin_channels)).astype(np.float32))
    audio, _ = jax.jit(S.voice_conversion, static_argnames=("cfg", "fast"))(
        params, cfg, spec, jnp.asarray([t]), g_s, g_t, 0.0,
        jnp.zeros((1, t, cfg.inter_channels)),
    )
    return np.asarray(audio[0, :, 0], np.float32)


def tts_case() -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from openvoice_tpu.config import SynthesizerConfig
    from openvoice_tpu.models import synthesizer as S

    cfg = SynthesizerConfig(**_TTS_CFG)
    params = S.init_synthesizer(jax.random.PRNGKey(321), cfg)
    tokens = np.asarray([[3, 5, 7, 2, 9, 11, 4, 6, 8, 10, 1, 12, 13, 14, 15]], np.int32)
    enc = jax.jit(S.tts_encode, static_argnames=("cfg",))(
        params, cfg, jnp.asarray(tokens), jnp.asarray([15]), jnp.asarray([2]),
        jax.random.PRNGKey(0), noise_scale_w=0.0,
    )
    y_len = int(np.asarray(enc.w_ceil).sum())
    mf = y_len + 8
    audio, _ = jax.jit(S.tts_decode, static_argnames=("cfg", "max_frames", "fast"))(
        params, cfg, enc, mf, jnp.zeros((1, mf, cfg.inter_channels)),
        noise_scale=0.0,
    )
    return np.asarray(audio[0, :, 0], np.float32)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    GOLDEN_DIR.mkdir(exist_ok=True)
    np.save(GOLDEN_DIR / "convert_audio_tiny.npy", convert_case())
    np.save(GOLDEN_DIR / "tts_audio_tiny.npy", tts_case())
    print("regenerated", sorted(p.name for p in GOLDEN_DIR.iterdir()))


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
