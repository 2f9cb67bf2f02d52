"""User-facing API: `ToneColorConverter` and `BaseSpeakerTTS`.

Mirrors the reference surface (api.py:14-201) so reference users can switch
with minimal changes, but the execution model is TPU-native:

* every device computation is a jitted graph cached per length *bucket*
  (runtime/bucketing.py) — no per-utterance recompiles, no dynamic shapes;
* spectrogram framing semantics are kept exact by reflect-padding the true
  signal on host before zero-extending to the bucket (the reference computes
  STFT at exact length; masking does the rest);
* RNG is explicit (`seed` arguments) instead of global torch state;
* checkpoints: reference .pth (via torch) or portable .npz pytrees.
"""

from __future__ import annotations

import os
import re
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from openvoice_tpu.audio.io import load_audio, write_wav
from openvoice_tpu.audio.stft import frame_signal, stft_basis
from openvoice_tpu.config import HParams, SynthesizerConfig, load_hparams
from openvoice_tpu.models import synthesizer as S
from openvoice_tpu.runtime.bucketing import round_up_to_bucket
from openvoice_tpu.pipeline import watermark as wm


def _spec_from_audio(audio: np.ndarray, cfg: SynthesizerConfig) -> tuple[np.ndarray, int]:
    """Host reflect-pad + true frame count; returns (padded_audio_1d, n_frames).

    Matches spectrogram_torch framing (mel_processing.py:54-74): pad
    (n_fft-hop)/2 reflect on both sides, center=False.
    """
    pad = (cfg.filter_length - cfg.hop_length) // 2
    padded = np.concatenate([audio[1 : pad + 1][::-1], audio, audio[-pad - 1 : -1][::-1]])
    n_frames = (len(padded) - cfg.filter_length) // cfg.hop_length + 1
    return padded, n_frames


def _use_pallas_stft(n_fft: int, hop: int) -> bool:
    """Pallas STFT on real TPU (1.8× the XLA path on v5e); XLA elsewhere.

    The kernel views audio as [B, chunks, hop] in HBM, so `hop` must be a
    multiple of the 128-lane tile (true for every shipped config, hop=256;
    small test configs fall back to the XLA matmul path)."""
    try:
        return (
            jax.default_backend() == "tpu"
            and n_fft % hop == 0
            and hop % 128 == 0
        )
    except RuntimeError:
        return False


@partial(jax.jit, static_argnames=("n_fft", "hop", "win"))
def _spec_btf(padded_audio: jnp.ndarray, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    """[B, L_padded] pre-reflect-padded audio → [B, T, n_freq] magnitudes."""
    if _use_pallas_stft(n_fft, hop):
        from openvoice_tpu.ops.stft_pallas import stft_magnitude_pallas

        return stft_magnitude_pallas(padded_audio.astype(jnp.float32), n_fft, hop, win)
    frames = frame_signal(padded_audio.astype(jnp.float32), n_fft, hop)
    basis = jnp.asarray(stft_basis(n_fft, win))
    proj = jnp.dot(frames, basis, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    n_freq = n_fft // 2 + 1
    re_, im_ = proj[..., :n_freq], proj[..., n_freq:]
    return jnp.sqrt(re_ * re_ + im_ * im_ + 1e-6)


class OpenVoiceBaseClass:
    """Config + params holder (reference api.py:14-39 equivalent)."""

    def __init__(self, config_path: str | None = None, cfg: SynthesizerConfig | None = None):
        if config_path is not None:
            self.hps: HParams | None = load_hparams(config_path)
            self.cfg = SynthesizerConfig.from_hparams(self.hps)
            self.version = self.hps.get("_version_", "v1")
        else:
            assert cfg is not None
            self.hps = None
            self.cfg = cfg
            self.version = "v2" if cfg.zero_g else "v1"
        self.params: dict | None = None

    def load_ckpt(self, ckpt_path: str) -> dict:
        """Load reference .pth (torch) or portable .npz; returns the
        missing/unexpected report (strict=False semantics, api.py:35-39)."""
        if ckpt_path.endswith(".npz"):
            from openvoice_tpu.ckpt.torch_import import load_params_npz

            self.params = load_params_npz(ckpt_path)
            report = {"missing": [], "unexpected": []}
        else:
            from openvoice_tpu.ckpt.torch_import import load_torch_checkpoint

            self.params, report = load_torch_checkpoint(ckpt_path, self.cfg)
        self._dec_cache = None
        print(f"Loaded checkpoint '{ckpt_path}'")
        print("missing/unexpected keys:", report["missing"], report["unexpected"])
        return report

    def init_random(self, seed: int = 0) -> None:
        """Random weights (development / benchmarking without a checkpoint).

        Jitted: eager init dispatches hundreds of tiny RNG ops (measured
        ~54 s through the remote-dispatch tunnel); one compiled+cached graph
        runs in well under a second."""
        init = jax.jit(S.init_synthesizer, static_argnames=("cfg",))
        self.params = init(jax.random.PRNGKey(seed), self.cfg)
        self._dec_cache = None

    def _require_params(self) -> dict:
        if self.params is None:
            raise RuntimeError("no weights loaded: call load_ckpt() or init_random()")
        return self.params

    def _require_dec_cache(self) -> dict:
        """Lazily packed fused-decoder weights for the bf16 serving mode
        (models/synthesizer.py::make_dec_cache); rebuilt on weight reload."""
        if getattr(self, "_dec_cache", None) is None:
            self._dec_cache = S.make_dec_cache(self._require_params(), self.cfg)
        return self._dec_cache


class ToneColorConverter(OpenVoiceBaseClass):
    """Zero-shot tone-color conversion (reference api.py:101-201)."""

    def __init__(self, *args, enable_watermark: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.enable_watermark = enable_watermark

    # -- speaker embeddings -------------------------------------------------

    def extract_se(self, ref_wav_list, se_save_path: str | None = None) -> np.ndarray:
        """Per-file SE then mean over files (api.py:114-139); returns
        [1, gin, 1] to stay drop-in with reference .pth SE tensors."""
        if isinstance(ref_wav_list, str):
            ref_wav_list = [ref_wav_list]
        audios = [load_audio(f, sr=self.cfg.sampling_rate)[0] for f in ref_wav_list]
        # one bucketed batch over all files; the batch mean IS the per-file
        # mean (api.py:133) since each row is one file's whole-recording SE
        se = self._se_from_audio_batch(audios)  # [gin]
        out = se[None, :, None].astype(np.float32)
        if se_save_path is not None:
            os.makedirs(os.path.dirname(se_save_path) or ".", exist_ok=True)
            np.save(se_save_path if se_save_path.endswith(".npy") else se_save_path + ".npy", out)
        return out

    def extract_se_from_file(self, audio_path: str, vad: bool = True) -> np.ndarray:
        """Segment a reference recording, batch segments through ref_enc,
        mean → [1, gin, 1] (the get_se fast path).

        vad=True: energy-VAD splitter (the served default, matching
        openvoice_app.py:118).  vad=False: whisper-mode segmentation
        (se_extractor.py:19-74) when cached ASR weights exist, else the
        whole file as one segment (the reference would fail here; degrading
        keeps offline images working)."""
        from openvoice_tpu.pipeline.se_extractor import split_audio_vad
        from openvoice_tpu.pipeline.whisper_seg import make_segmenter, split_audio_whisper

        audio, sr = load_audio(audio_path, sr=self.cfg.sampling_rate)
        if vad:
            segments = split_audio_vad(audio, sr)
        else:
            seg = make_segmenter(prefer_whisper=True)
            segments = split_audio_whisper(audio, sr, seg) if seg else [audio]
            if not segments:
                segments = [audio]
        se = self._se_from_audio_batch(segments)
        return se[None, :, None].astype(np.float32)

    def _se_from_audio_batch(self, audios: list[np.ndarray]) -> np.ndarray:
        """Mean tone color over a batch of same-speaker clips → [gin].

        All clips run as ONE length-aware batched graph per bucket: padded to
        the largest clip's bucket, true frame counts passed as lengths (the
        masked ref_enc is exact — see nn/ref_encoder.py)."""
        params = self._require_params()
        cfg = self.cfg
        prepared = [_spec_from_audio(a, cfg) for a in audios]
        bucket = round_up_to_bucket(max(n for _, n in prepared))
        target_len = (bucket - 1) * cfg.hop_length + cfg.filter_length
        batch = np.zeros((len(prepared), target_len), np.float32)
        lengths = np.zeros(len(prepared), np.int32)
        for i, (padded, n_frames) in enumerate(prepared):
            batch[i, : len(padded)] = padded
            lengths[i] = n_frames
        spec = _spec_btf(jnp.asarray(batch), cfg.filter_length, cfg.hop_length, cfg.win_length)
        ses = _jit_tone_color(params, spec, jnp.asarray(lengths))
        return np.mean(np.asarray(ses), axis=0)

    # -- conversion ---------------------------------------------------------

    def convert(
        self,
        audio_src_path,
        src_se,
        tgt_se,
        output_path: str | None = None,
        tau: float = 0.3,
        message: str = "default",
        seed: int = 0,
        fast: bool = False,
    ):
        """Reference-compatible convert (api.py:141-160).

        `audio_src_path` may be a path or a float waveform at sampling_rate.
        src/tgt SE accept [1, gin, 1] (reference layout) or [gin].
        fast=True decodes in bfloat16 (serving mode, ~1.7× end-to-end).
        """
        cfg = self.cfg
        params = self._require_params()
        if isinstance(audio_src_path, (str, os.PathLike)):
            audio, _ = load_audio(str(audio_src_path), sr=cfg.sampling_rate)
        else:
            audio = np.asarray(audio_src_path, np.float32)

        padded, n_frames = _spec_from_audio(audio, cfg)
        bucket = round_up_to_bucket(n_frames)
        target_len = (bucket - 1) * cfg.hop_length + cfg.filter_length
        buf = np.zeros(target_len, np.float32)
        buf[: len(padded)] = padded

        g_src = self._as_g(src_se)
        g_tgt = self._as_g(tgt_se)
        # host-side noise: an eager jax.random.normal here is a blocking
        # device round-trip through the dispatch tunnel (measured minutes of
        # first-call latency; same fix as serve/batcher.py).  numpy's
        # row-major fill also makes convert/convert_streaming draws agree on
        # the shared prefix for the same seed.
        noise = np.random.default_rng(seed).standard_normal(
            (1, bucket, cfg.inter_channels)).astype(np.float32)
        out = _jit_convert(
            params, cfg, jnp.asarray(buf)[None], jnp.asarray([n_frames]),
            g_src, g_tgt, float(tau), noise, fast=fast,
            dec_cache=self._require_dec_cache() if fast else None,
        )
        # device-slice the trailing unit dim BEFORE the host transfer: the
        # dispatch tunnel reads minor-dim-1 arrays back element-wise
        # (measured 472 s for 7.3 MB vs 0.4 s squeezed)
        audio_out = np.asarray(out[0, : n_frames * cfg.upsample_factor, 0])
        if self.enable_watermark and message:
            audio_out = self.add_watermark(audio_out, message)
        if output_path is None:
            return audio_out
        write_wav(output_path, audio_out, cfg.sampling_rate)
        return None

    def convert_streaming(
        self,
        audio_src_path,
        src_se,
        tgt_se,
        output_path: str | None = None,
        tau: float = 0.3,
        message: str = "default",
        seed: int = 0,
        fast: bool = True,
        chunk_frames: int = 896,
    ):
        """Constant-memory conversion for arbitrarily long recordings: the
        spectrogram streams through one fixed-shape compiled graph in
        halo-extended chunks (runtime/streaming.py), bit-equal to convert()
        up to float roundoff.  The reference has no equivalent — it decodes
        whole utterances in one pass (api.py:150-154) and runs out of
        memory on long audio."""
        cfg = self.cfg
        params = self._require_params()
        if isinstance(audio_src_path, (str, os.PathLike)):
            audio, _ = load_audio(str(audio_src_path), sr=cfg.sampling_rate)
        else:
            audio = np.asarray(audio_src_path, np.float32)
        padded, n_frames = _spec_from_audio(audio, cfg)
        # host numpy STFT: the streaming design keeps the full spectrogram
        # in host RAM anyway, and a device STFT + [T, 513] f32 readback
        # costs ~1 GB/hour of audio through a remote dispatch tunnel
        from openvoice_tpu.audio.stft import host_spectrogram

        spec = host_spectrogram(
            padded, cfg.filter_length, cfg.hop_length, cfg.win_length
        )[None]
        noise = np.random.default_rng(seed).standard_normal(
            (1, n_frames, cfg.inter_channels)).astype(np.float32)
        from openvoice_tpu.runtime.streaming import voice_conversion_streaming

        out = voice_conversion_streaming(
            params, cfg, spec[:, :n_frames], np.asarray([n_frames]),
            self._as_g(src_se), self._as_g(tgt_se), float(tau), np.asarray(noise),
            chunk_frames=chunk_frames, fast=fast,
            dec_cache=self._require_dec_cache() if fast else None,
        )
        audio_out = out[0, : n_frames * cfg.upsample_factor, 0]
        if self.enable_watermark and message:
            audio_out = self.add_watermark(audio_out, message)
        if output_path is None:
            return audio_out
        write_wav(output_path, audio_out, cfg.sampling_rate)
        return None

    def _as_g(self, se) -> jnp.ndarray:
        se = np.asarray(se, np.float32)
        if se.ndim == 3:  # [1, gin, 1] reference layout
            se = se[0, :, 0]
        elif se.ndim == 2:
            se = se.reshape(-1)
        return jnp.asarray(se)[None, None, :]  # [1, 1, gin]

    # -- watermark ----------------------------------------------------------

    def add_watermark(self, audio: np.ndarray, message: str) -> np.ndarray:
        if not self.enable_watermark:
            return audio
        return wm.add_watermark(audio, message)

    def detect_watermark(self, audio: np.ndarray, n_repeat: int) -> str:
        return wm.detect_watermark(audio, n_repeat)


_jit_tone_color = jax.jit(S.extract_tone_color)


@partial(jax.jit, static_argnames=("cfg", "fast"))
def _jit_convert(params, cfg, padded_audio, spec_lengths, g_src, g_tgt, tau, noise,
                 fast=False, dec_cache=None):
    """The whole convert path — STFT → enc_q → flows → decoder — as ONE
    compiled graph per bucket (SURVEY.md §7.1).  fast=True: bf16 decoder,
    with pre-packed fused-kernel weights via dec_cache."""
    spec = _spec_inner(padded_audio, cfg)
    audio, _ = S.voice_conversion(
        params, cfg, spec, spec_lengths, g_src, g_tgt, tau, noise, fast=fast,
        dec_cache=dec_cache,
    )
    return audio


def _spec_inner(padded_audio: jnp.ndarray, cfg: SynthesizerConfig) -> jnp.ndarray:
    if _use_pallas_stft(cfg.filter_length, cfg.hop_length):
        from openvoice_tpu.ops.stft_pallas import stft_magnitude_pallas

        return stft_magnitude_pallas(
            padded_audio.astype(jnp.float32), cfg.filter_length, cfg.hop_length, cfg.win_length
        )
    frames = frame_signal(padded_audio.astype(jnp.float32), cfg.filter_length, cfg.hop_length)
    basis = jnp.asarray(stft_basis(cfg.filter_length, cfg.win_length))
    proj = jnp.dot(frames, basis, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    n_freq = cfg.filter_length // 2 + 1
    re_, im_ = proj[..., :n_freq], proj[..., n_freq:]
    return jnp.sqrt(re_ * re_ + im_ * im_ + 1e-6)


class BaseSpeakerTTS(OpenVoiceBaseClass):
    """V1 text→speech in stock voices (reference api.py:42-98)."""

    # the reference ships EN/ZH only (api.py:43-46); JA/KO work here because
    # our frontend implements the cleaners the reference left undefined
    language_marks = {"english": "EN", "chinese": "ZH", "japanese": "JA", "korean": "KO"}

    def _sentence_tokens(self, text: str, speaker, language: str):
        """Shared frontend: sentence split → cleaners → IPA token ids.
        Returns (list of int32 token arrays, speaker_id)."""
        from openvoice_tpu.text import intersperse, text_to_sequence
        from openvoice_tpu.text.split import split_sentence

        cfg = self.cfg
        mark = self.language_marks.get(language.lower())
        assert mark is not None, f"language {language} is not supported"

        if self.hps is not None:
            symbols = list(self.hps.symbols)
            cleaners = list(self.hps.data.text_cleaners)
            speaker_id = self.hps.speakers[speaker]
        else:
            from openvoice_tpu.text import default_symbols

            symbols = default_symbols
            cleaners = ["cjke_cleaners2"]
            # no speakers map without an imported config: numeric ids pass
            # through, names (e.g. "default") fall back to id 0
            if isinstance(speaker, int):
                speaker_id = speaker
            elif str(speaker).lstrip("-").isdigit():
                speaker_id = int(speaker)
            else:
                speaker_id = 0

        token_seqs = []
        for t in split_sentence(text, language_str=mark):
            t = re.sub(r"([a-z])([A-Z])", r"\1 \2", t)
            t = f"[{mark}]{t}[{mark}]"
            seq = text_to_sequence(t, symbols, cleaners)
            if cfg.add_blank:
                seq = intersperse(seq, 0)
            token_seqs.append(np.asarray(seq, np.int32))
        return token_seqs, speaker_id

    def tts(
        self,
        text: str,
        output_path: str | None,
        speaker: str,
        language: str = "English",
        speed: float = 1.0,
        seed: int = 0,
        fast: bool = False,
    ):
        """Sequential per-sentence TTS (reference api.py:73-98 semantics).

        All sampling noise is drawn host-side with numpy (an eager
        jax.random call is a blocking first-use device round-trip measured
        in *minutes* through remote-dispatch tunnels) and fed into the two
        jitted stages; tts_batched draws the identical noise, so the two
        paths produce the same audio for the same seed (per fast mode:
        fast=True decodes bf16 through the fused Pallas decoder, same as
        tts_batched(fast=True) — f32 remains the parity default)."""
        cfg = self.cfg
        params = self._require_params()
        token_seqs, speaker_id = self._sentence_tokens(text, speaker, language)
        noise_rngs = _sentence_noise_rngs(seed, len(token_seqs))
        dec_cache = self._require_dec_cache() if fast else None
        pieces = []
        for i, tokens in enumerate(token_seqs):
            t_bucket = round_up_to_bucket(len(tokens))
            padded = np.zeros((1, t_bucket), np.int32)
            padded[0, : len(tokens)] = tokens
            rng_w, rng_y = noise_rngs[i]
            noise_w = rng_w.standard_normal((1, t_bucket, 2)).astype(np.float32)
            enc = S.tts_encode_jit(
                params, cfg, jnp.asarray(padded), jnp.asarray([len(tokens)]),
                jnp.asarray([speaker_id]), None,
                noise_scale_w=0.6, length_scale=1.0 / speed, sdp_ratio=0.2,
                noise_w=jnp.asarray(noise_w),
            )
            total = int(np.asarray(enc.w_ceil).sum())
            fb = round_up_to_bucket(max(total, 1))
            noise = rng_y.standard_normal((1, fb, cfg.inter_channels)).astype(np.float32)
            audio, y_mask = S.tts_decode_jit(
                params, cfg, enc, fb, jnp.asarray(noise), noise_scale=0.667,
                fast=fast, dec_cache=dec_cache,
            )
            audio = np.asarray(audio[..., 0])
            y_len = int(np.asarray(jnp.sum(y_mask[..., 0], axis=-1))[0])
            pieces.append(audio[0, : y_len * cfg.upsample_factor])

        out = _concat_with_gaps(pieces, cfg.sampling_rate, speed)
        if output_path is None:
            return out
        write_wav(output_path, out, cfg.sampling_rate)
        return None

    def tts_batched(
        self,
        text: str,
        output_path: str | None,
        speaker: str,
        language: str = "English",
        speed: float = 1.0,
        seed: int = 0,
        fast: bool = False,
    ):
        """Bucketed-batch TTS: sentences run as batches per token bucket
        (encode) and per frame bucket (decode) instead of the reference's
        sequential Python loop (api.py:80-92) — 2 jitted dispatches per
        bucket for the whole request.  Per-sentence RNG is derived exactly
        as in tts() and the sdp/decode noise is stacked from per-sentence
        draws, so the output matches tts() for the same seed.

        fast=True decodes in bf16 (serving mode)."""
        cfg = self.cfg
        params = self._require_params()
        token_seqs, speaker_id = self._sentence_tokens(text, speaker, language)
        n = len(token_seqs)
        if n == 0:
            out = np.zeros(0, np.float32)
            if output_path is None:
                return out
            write_wav(output_path, out, cfg.sampling_rate)
            return None

        # per-sentence numpy generators in tts()'s order → identical draws
        noise_rngs = _sentence_noise_rngs(seed, n)

        enc_rows = _encode_rows(params, cfg, token_seqs, speaker_id, speed, noise_rngs)

        # ---- decode, grouped by frame bucket ---------------------------------
        g_row = np.asarray(params["emb_g"])[speaker_id][None, :]  # [1, gin]
        pieces: list[np.ndarray | None] = [None] * n
        fgroups: dict[int, list[int]] = {}
        for i in range(n):
            total = int(enc_rows[i]["w_ceil"].sum())
            fgroups.setdefault(round_up_to_bucket(max(total, 1)), []).append(i)
        dec_cache = self._require_dec_cache() if fast else None
        for fb, idxs in fgroups.items():
            enc = _stack_enc_rows(enc_rows, idxs, g_row)
            noise = np.stack([
                noise_rngs[i][1].standard_normal((fb, cfg.inter_channels)).astype(np.float32)
                for i in idxs
            ])
            audio, y_mask = S.tts_decode_jit(
                params, cfg, enc, fb, jnp.asarray(noise),
                noise_scale=0.667, fast=fast, dec_cache=dec_cache,
            )
            # device-slice the unit dim before readback (see convert())
            audio = np.asarray(audio[..., 0])
            y_lengths = np.asarray(jnp.sum(y_mask[..., 0], axis=-1)).astype(np.int64)
            for r, i in enumerate(idxs):
                pieces[i] = audio[r, : y_lengths[r] * cfg.upsample_factor]

        out = _concat_with_gaps(pieces, cfg.sampling_rate, speed)
        if output_path is None:
            return out
        write_wav(output_path, out, cfg.sampling_rate)
        return None


def tts_convert_batched(
    tts_model: BaseSpeakerTTS,
    converter: "ToneColorConverter",
    text: str,
    speaker,
    src_se,
    tgt_se,
    language: str = "English",
    speed: float = 1.0,
    tau: float = 0.3,
    seed: int = 0,
    message: str = "default",
    fast: bool = True,
    output_path: str | None = None,
):
    """Fused serving path for the tts→convert chain (reference
    openvoice_app.py:131-141 / demo_part1): bucketed-batch TTS encode, then
    decode + STFT + tone conversion as ONE jitted dispatch per frame bucket
    (models/synthesizer.py::tts_decode_convert) — the base audio never
    leaves the device, removing two dispatches and one readback per request
    vs `tts_batched` + `convert`.

    Semantics: each sentence is converted INDIVIDUALLY (per-sentence conv
    noise derived from `seed`), then joined with the reference's 0.05 s ÷
    speed silence gaps, and the watermark is applied once to the joined
    output.  This differs from `predict`'s staged flow only in that the
    silence gaps pass through unconverted (the staged flow converts the
    gaps too — which a zero-input converter maps to near-silence).
    tests/test_app.py asserts equality against the per-sentence staged
    truth.
    """
    cfg = tts_model.cfg
    ccfg = converter.cfg
    params = tts_model._require_params()
    cparams = converter._require_params()
    token_seqs, speaker_id = tts_model._sentence_tokens(text, speaker, language)
    n = len(token_seqs)
    if n == 0:
        out = np.zeros(0, np.float32)
        if output_path is None:
            return out
        write_wav(output_path, out, cfg.sampling_rate)
        return None
    noise_rngs = _sentence_noise_rngs(seed, n)
    conv_rngs = _sentence_conv_rngs(seed, n)

    enc_rows = _encode_rows(params, cfg, token_seqs, speaker_id, speed, noise_rngs)

    # ---- fused decode+convert, grouped by frame bucket ------------------
    g_row = np.asarray(params["emb_g"])[speaker_id][None, :]
    g_src = converter._as_g(src_se)
    g_tgt = converter._as_g(tgt_se)
    pieces: list[np.ndarray | None] = [None] * n
    fgroups: dict[int, list[int]] = {}
    for i in range(n):
        total = int(enc_rows[i]["w_ceil"].sum())
        fgroups.setdefault(round_up_to_bucket(max(total, 1)), []).append(i)
    tts_cache = tts_model._require_dec_cache() if fast else None
    conv_cache = converter._require_dec_cache() if fast else None
    for fb, idxs in fgroups.items():
        m = len(idxs)
        enc = _stack_enc_rows(enc_rows, idxs, g_row)
        noise_dec = np.stack([
            noise_rngs[i][1].standard_normal((fb, cfg.inter_channels)).astype(np.float32)
            for i in idxs
        ])
        noise_conv = np.stack([
            conv_rngs[i].standard_normal((fb, ccfg.inter_channels)).astype(np.float32)
            for i in idxs
        ])
        audio, y_mask = S.tts_decode_convert_jit(
            params, cfg, enc, fb, jnp.asarray(noise_dec),
            cparams, ccfg,
            jnp.repeat(g_src, m, axis=0), jnp.repeat(g_tgt, m, axis=0),
            float(tau), jnp.asarray(noise_conv),
            noise_scale=0.667, fast=fast,
            tts_dec_cache=tts_cache, conv_dec_cache=conv_cache,
        )
        audio_np = np.asarray(audio[..., 0])
        y_lengths = np.asarray(jnp.sum(y_mask[..., 0], axis=-1)).astype(np.int64)
        for r, i in enumerate(idxs):
            pieces[i] = audio_np[r, : y_lengths[r] * cfg.upsample_factor]

    out = _concat_with_gaps(pieces, cfg.sampling_rate, speed)
    if converter.enable_watermark and message:
        out = converter.add_watermark(out, message)
    if output_path is None:
        return out
    write_wav(output_path, out, cfg.sampling_rate)
    return None


def tts_convert_single_dispatch(
    tts_model: BaseSpeakerTTS,
    converter: "ToneColorConverter",
    text: str,
    speaker,
    src_se,
    tgt_se,
    language: str = "English",
    speed: float = 1.0,
    tau: float = 0.3,
    seed: int = 0,
    message: str = "default",
    fast: bool = True,
    frames_per_token: float = 6.0,
    output_path: str | None = None,
    stats: dict | None = None,
):
    """Text → cloned audio with ONE device dispatch per token bucket: the
    whole encode + duration + decode + STFT + conversion chain runs as a
    single graph (models/synthesizer.py::tts_synthesize_convert), with the
    data-dependent output length capped at `frames_per_token · token_bucket`
    frames (static shape — the reference's max_len truncation precedent).
    Sentences whose predicted duration exceeds the cap are detected from
    the returned uncapped duration sums and re-run exactly through the
    two-stage fused path — output is never silently truncated.

    vs tts_convert_batched this removes the encode dispatch and the w_ceil
    readback (one round trip total instead of three) at the cost of
    decode-bucket padding sized by the cap rather than the true duration.
    Noise draws are shaped by the static cap, so audio differs from (while
    being as valid as) the other paths' draws for the same seed.

    `stats`, when given a dict, is filled with {"sentences",
    "overflow_sentences"} so callers (benchmarks, capacity planning) can
    see how often the cap forced the hybrid fallback.
    """
    cfg = tts_model.cfg
    ccfg = converter.cfg
    params = tts_model._require_params()
    cparams = converter._require_params()
    token_seqs, speaker_id = tts_model._sentence_tokens(text, speaker, language)
    n = len(token_seqs)
    if n == 0:
        out = np.zeros(0, np.float32)
        if output_path is None:
            return out
        write_wav(output_path, out, cfg.sampling_rate)
        return None
    noise_rngs = _sentence_noise_rngs(seed, n)
    conv_rngs = _sentence_conv_rngs(seed, n)
    g_src = converter._as_g(src_se)
    g_tgt = converter._as_g(tgt_se)
    tts_cache = tts_model._require_dec_cache() if fast else None
    conv_cache = converter._require_dec_cache() if fast else None

    pieces: list[np.ndarray | None] = [None] * n
    overflow: list[int] = []
    groups: dict[int, list[int]] = {}
    for i, seq in enumerate(token_seqs):
        groups.setdefault(round_up_to_bucket(len(seq)), []).append(i)
    for tb, idxs in groups.items():
        m = len(idxs)
        fb = round_up_to_bucket(max(int(tb * frames_per_token), 1))
        toks, lens, noise_w = _pack_token_batch(token_seqs, idxs, tb, noise_rngs)
        noise_dec = np.stack([
            noise_rngs[i][1].standard_normal(
                (fb, cfg.inter_channels)).astype(np.float32)
            for i in idxs
        ])
        noise_conv = np.stack([
            conv_rngs[i].standard_normal(
                (fb, ccfg.inter_channels)).astype(np.float32)
            for i in idxs
        ])
        audio, y_frames, total = S.tts_synthesize_convert_jit(
            params, cfg, jnp.asarray(toks), jnp.asarray(lens),
            jnp.asarray([speaker_id] * m), jnp.asarray(noise_w), fb,
            jnp.asarray(noise_dec), cparams, ccfg,
            jnp.repeat(g_src, m, axis=0), jnp.repeat(g_tgt, m, axis=0),
            float(tau), jnp.asarray(noise_conv),
            length_scale=1.0 / speed, fast=fast,
            tts_dec_cache=tts_cache, conv_dec_cache=conv_cache,
        )
        audio_np = np.asarray(audio[..., 0])
        y_np = np.asarray(y_frames)
        total_np = np.asarray(total)
        for r, i in enumerate(idxs):
            if total_np[r] > fb:
                overflow.append(i)  # capped: re-run exactly below
            else:
                pieces[i] = audio_np[r, : int(y_np[r]) * cfg.upsample_factor]

    if stats is not None:
        stats["sentences"] = n
        stats["overflow_sentences"] = len(overflow)
    if overflow:
        # rare long sentences: re-run through the two-stage fused machinery
        # at their true frame buckets — exact, never truncated
        for i, piece in _two_stage_pieces(
            params, cfg, cparams, ccfg, token_seqs, overflow, seed, n,
            speaker_id, speed, g_src, g_tgt, tau, fast, tts_cache, conv_cache,
        ).items():
            pieces[i] = piece

    out = _concat_with_gaps(pieces, cfg.sampling_rate, speed)
    if converter.enable_watermark and message:
        out = converter.add_watermark(out, message)
    if output_path is None:
        return out
    write_wav(output_path, out, cfg.sampling_rate)
    return None


def tts_convert_stream(
    tts_model: BaseSpeakerTTS,
    converter: "ToneColorConverter",
    text: str,
    speaker,
    src_se,
    tgt_se,
    language: str = "English",
    speed: float = 1.0,
    tau: float = 0.3,
    seed: int = 0,
    message: str = "default",
    fast: bool = True,
    frames_per_token: float = 6.0,
):
    """Generator: cloned audio ARRIVES SENTENCE BY SENTENCE (each chunk is
    one sentence + its trailing gap, watermarked).  Time-to-first-audio is
    one single-dispatch round trip (~0.3 s here) instead of the whole
    text's synthesis — the progressive-playback mode the reference's
    whole-utterance loop cannot offer (api.py:80-98).

    Per-sentence draws use the same seed derivation as
    tts_convert_single_dispatch, so with watermarking off
    `np.concatenate(list(...))` equals that function's output for the same
    arguments (test-pinned), just delivered incrementally; with a message,
    each streamed chunk is watermarked individually (a one-shot caller
    watermarks the joined audio once instead).  Overflowing sentences
    (duration > the static cap) fall back exactly like single-dispatch.
    """
    cfg = tts_model.cfg
    ccfg = converter.cfg
    params = tts_model._require_params()
    cparams = converter._require_params()
    token_seqs, speaker_id = tts_model._sentence_tokens(text, speaker, language)
    n = len(token_seqs)
    if n == 0:
        return
    noise_rngs = _sentence_noise_rngs(seed, n)
    conv_rngs = _sentence_conv_rngs(seed, n)
    g_src = converter._as_g(src_se)
    g_tgt = converter._as_g(tgt_se)
    tts_cache = tts_model._require_dec_cache() if fast else None
    conv_cache = converter._require_dec_cache() if fast else None
    gap = np.zeros(int(cfg.sampling_rate * 0.05 / speed), np.float32)

    for i, seq in enumerate(token_seqs):
        tb = round_up_to_bucket(len(seq))
        fb = round_up_to_bucket(max(int(tb * frames_per_token), 1))
        toks = np.zeros((1, tb), np.int32)
        toks[0, : len(seq)] = seq
        noise_w = noise_rngs[i][0].standard_normal((tb, 2)).astype(np.float32)[None]
        noise_dec = noise_rngs[i][1].standard_normal(
            (fb, cfg.inter_channels)).astype(np.float32)[None]
        noise_conv = conv_rngs[i].standard_normal(
            (fb, ccfg.inter_channels)).astype(np.float32)[None]
        audio, y_frames, total = S.tts_synthesize_convert_jit(
            params, cfg, jnp.asarray(toks), jnp.asarray([len(seq)]),
            jnp.asarray([speaker_id]), jnp.asarray(noise_w), fb,
            jnp.asarray(noise_dec), cparams, ccfg, g_src, g_tgt,
            float(tau), jnp.asarray(noise_conv),
            length_scale=1.0 / speed, fast=fast,
            tts_dec_cache=tts_cache, conv_dec_cache=conv_cache,
        )
        if int(np.asarray(total)[0]) > fb:
            # overflow: exact two-stage fallback for this sentence (the
            # shared helper uses fresh generators — the capped dispatch
            # advanced the originals)
            piece = _two_stage_pieces(
                params, cfg, cparams, ccfg, token_seqs, [i], seed, n,
                speaker_id, speed, g_src, g_tgt, tau, fast,
                tts_cache, conv_cache,
            )[i]
        else:
            y_len = int(np.asarray(y_frames)[0])
            piece = np.asarray(audio[..., 0])[0, : y_len * cfg.upsample_factor]
        chunk = np.concatenate([piece, gap])
        if converter.enable_watermark and message:
            chunk = converter.add_watermark(chunk, message)
        yield chunk


def _pack_token_batch(token_seqs, idxs, tb, noise_rngs):
    """One token-bucket group's (tokens, lengths, sdp-noise) arrays —
    shared by every bucketed front end so the draw order stays identical
    across paths."""
    m = len(idxs)
    toks = np.zeros((m, tb), np.int32)
    lens = np.zeros(m, np.int32)
    noise_w = np.zeros((m, tb, 2), np.float32)
    for r, i in enumerate(idxs):
        toks[r, : len(token_seqs[i])] = token_seqs[i]
        lens[r] = len(token_seqs[i])
        noise_w[r] = noise_rngs[i][0].standard_normal((tb, 2)).astype(np.float32)
    return toks, lens, noise_w


def _two_stage_pieces(
    params, cfg, cparams, ccfg, token_seqs, sent_ids, seed, n_total,
    speaker_id, speed, g_src, g_tgt, tau, fast, tts_cache, conv_cache,
) -> dict:
    """Exact two-stage fused synthesis (encode → decode+convert) for the
    given sentence ids, with FRESH seed-derived generators — the overflow
    fallback shared by tts_convert_single_dispatch and tts_convert_stream;
    its draws equal tts_convert_batched's for the same seed (test-pinned).
    Returns {sentence_id: audio piece at true length}."""
    fresh_noise = _sentence_noise_rngs(seed, n_total)
    fresh_conv = _sentence_conv_rngs(seed, n_total)
    enc_rows = _encode_rows(
        params, cfg, [token_seqs[i] for i in sent_ids], speaker_id, speed,
        [fresh_noise[i] for i in sent_ids],
    )
    g_row = np.asarray(params["emb_g"])[speaker_id][None, :]
    pieces: dict = {}
    fgroups: dict[int, list[int]] = {}
    for k in range(len(sent_ids)):
        total_k = int(enc_rows[k]["w_ceil"].sum())
        fgroups.setdefault(round_up_to_bucket(max(total_k, 1)), []).append(k)
    for fb, ks in fgroups.items():
        enc = _stack_enc_rows(enc_rows, ks, g_row)
        noise_dec = np.stack([
            fresh_noise[sent_ids[k]][1].standard_normal(
                (fb, cfg.inter_channels)).astype(np.float32)
            for k in ks
        ])
        noise_conv = np.stack([
            fresh_conv[sent_ids[k]].standard_normal(
                (fb, ccfg.inter_channels)).astype(np.float32)
            for k in ks
        ])
        audio, y_mask = S.tts_decode_convert_jit(
            params, cfg, enc, fb, jnp.asarray(noise_dec), cparams, ccfg,
            jnp.repeat(g_src, len(ks), axis=0),
            jnp.repeat(g_tgt, len(ks), axis=0),
            float(tau), jnp.asarray(noise_conv),
            fast=fast, tts_dec_cache=tts_cache, conv_dec_cache=conv_cache,
        )
        audio_np = np.asarray(audio[..., 0])
        y_lengths = np.asarray(jnp.sum(y_mask[..., 0], axis=-1)).astype(np.int64)
        for r, k in enumerate(ks):
            pieces[sent_ids[k]] = audio_np[r, : y_lengths[r] * cfg.upsample_factor]
    return pieces


def _encode_rows(params, cfg, token_seqs, speaker_id, speed, noise_rngs) -> list[dict]:
    """Bucketed-batch TTS encode shared by tts_batched and
    tts_convert_batched: sentences grouped by token bucket, one
    tts_encode_jit dispatch per bucket, per-sentence rows returned in
    input order (keys m_p/logs_p/x_mask/w_ceil)."""
    n = len(token_seqs)
    enc_rows: list[dict | None] = [None] * n
    groups: dict[int, list[int]] = {}
    for i, seq in enumerate(token_seqs):
        groups.setdefault(round_up_to_bucket(len(seq)), []).append(i)
    for tb, idxs in groups.items():
        m = len(idxs)
        toks, lens, noise_w = _pack_token_batch(token_seqs, idxs, tb, noise_rngs)
        enc = S.tts_encode_jit(
            params, cfg, jnp.asarray(toks), jnp.asarray(lens),
            jnp.asarray([speaker_id] * m), None,
            noise_scale_w=0.6, length_scale=1.0 / speed, sdp_ratio=0.2,
            noise_w=jnp.asarray(noise_w),
        )
        m_p, logs_p = np.asarray(enc.m_p), np.asarray(enc.logs_p)
        x_mask, w_ceil = np.asarray(enc.x_mask), np.asarray(enc.w_ceil)
        for r, i in enumerate(idxs):
            enc_rows[i] = {"m_p": m_p[r], "logs_p": logs_p[r],
                           "x_mask": x_mask[r], "w_ceil": w_ceil[r]}
    return enc_rows


def _stack_enc_rows(enc_rows: list[dict], idxs: list[int], g_row: np.ndarray) -> "S.TTSEncodeOut":
    """Pad one frame-bucket group's encode rows to a common token length and
    stack them into a batched TTSEncodeOut."""
    tb_max = max(enc_rows[i]["m_p"].shape[0] for i in idxs)

    def padded(a):
        out = np.zeros((tb_max,) + a.shape[1:], a.dtype)
        out[: a.shape[0]] = a
        return out

    return S.TTSEncodeOut(
        m_p=jnp.asarray(np.stack([padded(enc_rows[i]["m_p"]) for i in idxs])),
        logs_p=jnp.asarray(np.stack([padded(enc_rows[i]["logs_p"]) for i in idxs])),
        x_mask=jnp.asarray(np.stack([padded(enc_rows[i]["x_mask"]) for i in idxs])),
        w_ceil=jnp.asarray(np.stack([padded(enc_rows[i]["w_ceil"]) for i in idxs])),
        g=jnp.asarray(np.repeat(g_row[None], len(idxs), axis=0)),
    )


def _sentence_conv_rngs(seed: int, n: int) -> list[np.random.Generator]:
    """Per-sentence conversion-noise generators for the fused tts→convert
    path (distinct root from the TTS draws so neither stream aliases)."""
    return [
        np.random.default_rng(ss)
        for ss in np.random.SeedSequence([seed, 0xC04]).spawn(n)
    ]


def _sentence_noise_rngs(seed: int, n: int) -> list[tuple[np.random.Generator, np.random.Generator]]:
    """Per-sentence (sdp-noise, decode-noise) numpy generators.  Shared by
    tts() and tts_batched() so their outputs match for the same seed."""
    out = []
    for child in np.random.SeedSequence(seed).spawn(n):
        w_ss, y_ss = child.spawn(2)
        out.append((np.random.default_rng(w_ss), np.random.default_rng(y_ss)))
    return out


def _concat_with_gaps(pieces: list[np.ndarray], sr: int, speed: float) -> np.ndarray:
    """0.05 s ÷ speed silence between sentences (api.py:56-63)."""
    gap = np.zeros(int(sr * 0.05 / speed), np.float32)
    out: list[np.ndarray] = []
    for p in pieces:
        out.append(np.asarray(p, np.float32).reshape(-1))
        out.append(gap)
    return np.concatenate(out) if out else np.zeros(0, np.float32)
