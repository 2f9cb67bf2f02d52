"""Full-dimension parity check: TPU f32 convert vs the torch CPU oracle.

The north star (BASELINE.md) is mel-allclose V2 tone conversion vs the
PyTorch reference on the bundled demo speakers.  Released checkpoints are
not downloadable in this environment, so this runs the REAL audio through
BOTH implementations at the REAL V2 model dimensions with shared random
weights — everything the released checkpoint changes is the numbers in the
tensors, which the importer is separately tested to carry bit-exactly
(tests/test_fullsize.py::test_fullsize_import_is_clean).

Usage:  python benchmarks/parity_fullsize.py      (TPU for JAX, CPU torch)

Prints one JSON line: max |audio diff|, mel-spectrogram max diff, pass/fail
at the parity tolerances used by the model test-suite.
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

    sys.path.insert(0, "/root/reference")  # torch oracle (imported, never copied)
    from openvoice.models import SynthesizerTrn

    from openvoice_tpu.audio.io import load_audio
    from openvoice_tpu.audio.mel import mel_filterbank
    from openvoice_tpu.ckpt.torch_import import import_synthesizer
    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.models import synthesizer as S

    torch.manual_seed(0)
    model = SynthesizerTrn(
        0, cfg.spec_channels,
        inter_channels=cfg.inter_channels, hidden_channels=cfg.hidden_channels,
        filter_channels=cfg.filter_channels, n_heads=cfg.n_heads,
        n_layers=cfg.n_layers, kernel_size=cfg.kernel_size, p_dropout=cfg.p_dropout,
        resblock=cfg.resblock,
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        upsample_rates=list(cfg.upsample_rates),
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        n_speakers=0, gin_channels=cfg.gin_channels, zero_g=cfg.zero_g,
    ).eval()
    params, report = import_synthesizer(
        {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}, cfg
    )
    assert not report["missing"] and not report["unexpected"], report

    # real bundled audio through the native mp3 decoder, reference STFT framing
    src, sr = load_audio("/root/reference/resources/example_reference.mp3",
                         sr=cfg.sampling_rate)
    tgt, _ = load_audio("/root/reference/resources/demo_speaker0.mp3",
                        sr=cfg.sampling_rate)
    src = src[2 * sr: 8 * sr]
    tgt = tgt[: 6 * sr]

    def torch_spec(a):
        y = torch.from_numpy(np.ascontiguousarray(a))[None]
        pad = (cfg.filter_length - cfg.hop_length) // 2
        y = torch.nn.functional.pad(y[None], (pad, pad), mode="reflect")[0]
        s = torch.stft(y, cfg.filter_length, hop_length=cfg.hop_length,
                       win_length=cfg.win_length, window=torch.hann_window(cfg.win_length),
                       center=False, onesided=True, return_complex=True)
        return torch.sqrt(s.real.pow(2) + s.imag.pow(2) + 1e-6)

    with torch.no_grad():
        se_src = model.ref_enc(torch_spec(src).transpose(1, 2)).unsqueeze(-1)
        se_tgt = model.ref_enc(torch_spec(tgt).transpose(1, 2)).unsqueeze(-1)
        spec = torch_spec(src)
        audio_t = model.voice_conversion(
            spec, torch.tensor([spec.shape[-1]]), se_src, se_tgt, tau=0.0,
        )[0][0, 0].numpy()

    # JAX on the default backend (TPU when present), full-f32 matmuls
    t_frames = spec.shape[-1]
    spec_j = jnp.asarray(np.swapaxes(np.asarray(spec), 1, 2))
    g_s = jnp.asarray(np.asarray(se_src)[:, :, 0])[:, None, :]
    g_t = jnp.asarray(np.asarray(se_tgt)[:, :, 0])[:, None, :]
    audio_j, _ = jax.jit(S.voice_conversion, static_argnames=("cfg", "fast"))(
        params, cfg, spec_j, jnp.asarray([t_frames]), g_s, g_t, 0.0,
        jnp.zeros((1, t_frames, cfg.inter_channels)),
    )
    audio_j = np.asarray(audio_j[0, :, 0])

    n = min(len(audio_j), len(audio_t))
    adiff = float(np.max(np.abs(audio_j[:n] - audio_t[:n])))

    mel_fb = mel_filterbank(cfg.sampling_rate, cfg.filter_length, 80, 0.0, None)
    m_j = np.log(np.clip(mel_fb @ np.asarray(torch_spec(audio_j[:n])[0]), 1e-5, None))
    m_t = np.log(np.clip(mel_fb @ np.asarray(torch_spec(audio_t[:n])[0]), 1e-5, None))
    mdiff = float(np.max(np.abs(m_j - m_t)))

    print(json.dumps({
        "metric": "fullsize_parity_vs_torch_oracle",
        "backend": jax.default_backend(),
        "frames": int(t_frames),
        "audio_max_abs_diff": round(adiff, 6),
        "log_mel_max_abs_diff": round(mdiff, 6),
        "pass": bool(adiff < 5e-3 and mdiff < 5e-2),
    }))


if __name__ == "__main__":
    main()
