"""Full-dimension V1 TTS parity: TPU f32 `infer` vs the torch CPU oracle.

The convert path has a full-dimension TPU parity record
(benchmarks/parity_fullsize.py, docs/PARITY.md); this closes the same gap
for the flagship TTS graph — enc_p → sdp/dp → length regulation → reverse
flow → HiFi-GAN decode (reference models.py:467-490) — at the released V1
base-speaker dimensions (n_vocab 87, n_speakers 10, zero_g False;
tests/test_fullsize.py::FULL_V1_TTS).

Released checkpoints are not downloadable here, so both implementations
share ONE random torch state_dict (the importer is separately proven
bit-exact at these dimensions).  Noise is pinned to zero on both sides
(noise_scale=0, noise_scale_w=0) so the graphs are deterministic; the text
is a real sentence through our English frontend.

Usage:  python benchmarks/parity_fullsize_tts.py    (TPU for JAX, CPU torch)

Prints one JSON line: audio max |diff|, log-mel max |diff|, duration match,
pass/fail at the convert-path tolerances.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    # torch oracle imported from the read-only reference tree (never copied);
    # tests.oracle is NOT imported here because tests/conftest.py pins the
    # CPU backend at import time and this must run on the TPU
    sys.path.insert(0, "/root/reference")
    from openvoice.models import SynthesizerTrn

    import dataclasses

    from openvoice_tpu.audio.mel import mel_filterbank
    from openvoice_tpu.ckpt.torch_import import import_synthesizer
    from openvoice_tpu.config import V2_CONVERTER_CONFIG
    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.text import text_to_sequence
    from openvoice_tpu.text.symbols import symbols

    # released V1 base-speaker dims (tests/test_fullsize.py::FULL_V1_TTS)
    cfg = dataclasses.replace(
        V2_CONVERTER_CONFIG, n_vocab=87, n_speakers=10, zero_g=False
    )
    torch.manual_seed(17)
    model = SynthesizerTrn(
        cfg.n_vocab, cfg.spec_channels,
        inter_channels=cfg.inter_channels, hidden_channels=cfg.hidden_channels,
        filter_channels=cfg.filter_channels, n_heads=cfg.n_heads,
        n_layers=cfg.n_layers, kernel_size=cfg.kernel_size,
        p_dropout=cfg.p_dropout, resblock=cfg.resblock,
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        upsample_rates=list(cfg.upsample_rates),
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        n_speakers=cfg.n_speakers, gin_channels=cfg.gin_channels,
        zero_g=cfg.zero_g,
    ).eval()
    params, report = import_synthesizer(
        {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}, cfg
    )
    assert not report["missing"] and not report["unexpected"], report

    text = "The quick brown fox jumps over the lazy dog near the riverbank."
    tokens = np.asarray(
        text_to_sequence(text, symbols, ["cjke_cleaners2"]), np.int64
    )[None]
    lengths = np.array([tokens.shape[1]], np.int64)
    sid_v = 3

    with torch.no_grad():
        audio_t, _, _, _ = model.infer(
            torch.from_numpy(tokens), torch.from_numpy(lengths),
            sid=torch.tensor([sid_v]), noise_scale=0.0, noise_scale_w=0.0,
            length_scale=1.0, sdp_ratio=0.2,
        )
    audio_t = audio_t[0, 0].numpy()

    enc = jax.jit(S.tts_encode, static_argnames=("cfg",))(
        params, cfg, jnp.asarray(tokens), jnp.asarray(lengths),
        jnp.asarray([sid_v]), jax.random.PRNGKey(0),
        noise_scale_w=0.0, length_scale=1.0, sdp_ratio=0.2,
    )
    y_len = int(np.sum(np.asarray(enc.w_ceil)))
    dur_match = y_len == audio_t.shape[-1] // cfg.upsample_factor
    max_frames = y_len + 32  # padded on purpose: masking must preserve parity
    audio_j, _ = jax.jit(
        S.tts_decode, static_argnames=("cfg", "max_frames", "fast")
    )(
        params, cfg, enc, max_frames,
        jnp.zeros((1, max_frames, cfg.inter_channels)), noise_scale=0.0,
    )
    audio_j = np.asarray(audio_j[0, :, 0], np.float32)

    n = min(len(audio_j), len(audio_t))
    adiff = float(np.max(np.abs(audio_j[:n] - audio_t[:n])))

    def spec(a):
        y = torch.from_numpy(np.ascontiguousarray(a))[None]
        pad = (cfg.filter_length - cfg.hop_length) // 2
        y = torch.nn.functional.pad(y[None], (pad, pad), mode="reflect")[0]
        s = torch.stft(y, cfg.filter_length, hop_length=cfg.hop_length,
                       win_length=cfg.win_length,
                       window=torch.hann_window(cfg.win_length),
                       center=False, onesided=True, return_complex=True)
        return torch.sqrt(s.real.pow(2) + s.imag.pow(2) + 1e-6)

    mel_fb = mel_filterbank(cfg.sampling_rate, cfg.filter_length, 80, 0.0, None)
    m_j = np.log(np.clip(mel_fb @ np.asarray(spec(audio_j[:n])[0]), 1e-5, None))
    m_t = np.log(np.clip(mel_fb @ np.asarray(spec(audio_t[:n])[0]), 1e-5, None))
    mdiff = float(np.max(np.abs(m_j - m_t)))

    print(json.dumps({
        "metric": "fullsize_tts_parity_vs_torch_oracle",
        "backend": jax.default_backend(),
        "tokens": int(tokens.shape[1]),
        "audio_samples": int(n),
        "duration_frames_match": bool(dur_match),
        "audio_max_abs_diff": round(adiff, 6),
        "log_mel_max_abs_diff": round(mdiff, 6),
        "pass": bool(dur_match and adiff < 5e-3 and mdiff < 5e-2),
    }))


if __name__ == "__main__":
    main()
