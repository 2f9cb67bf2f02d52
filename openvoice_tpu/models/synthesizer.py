"""The VITS-style synthesizer: posterior encoder + coupling flow + HiFi-GAN
decoder, with either a tone-color reference encoder (converter mode,
n_speakers == 0) or a text path (base-TTS mode, n_speakers > 0) — mirroring
the capability split of the reference SynthesizerTrn (models.py:399-499).

Everything is a pure function over a parameter pytree; RNG is explicit.
`voice_conversion` and `infer_*` are designed to be jitted per length bucket
(static padded shapes + masks).  Layout is [B, T, C] throughout; the
spectrogram enters as [B, T, n_freq].
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.models.align import generate_path, sequence_mask
from openvoice_tpu.nn.attention import apply_encoder
from openvoice_tpu.nn.conv import conv1d
from openvoice_tpu.nn.duration import (
    apply_duration_predictor,
    apply_sdp_reverse,
)
from openvoice_tpu.nn.flows import apply_coupling_block
from openvoice_tpu.nn.hifigan import apply_generator
from openvoice_tpu.nn.ref_encoder import apply_reference_encoder
from openvoice_tpu.nn.wavenet import apply_wn


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _conv_init(rng, k, cin, cout, zero=False, groups=1, bias=True):
    kw, kb = jax.random.split(rng)
    fan_in = cin // groups * k
    s = 1.0 / math.sqrt(fan_in)
    if zero:
        w = jnp.zeros((k, cin // groups, cout), jnp.float32)
        b = jnp.zeros((cout,), jnp.float32) if bias else None
    else:
        w = jax.random.uniform(kw, (k, cin // groups, cout), jnp.float32, -s, s)
        b = jax.random.uniform(kb, (cout,), jnp.float32, -s, s) if bias else None
    p = {"w": w}
    if bias:
        p["b"] = b
    return p


def _conv2d_init(rng, kh, kw_, cin, cout):
    k1, k2 = jax.random.split(rng)
    s = 1.0 / math.sqrt(cin * kh * kw_)
    return {
        "w": jax.random.uniform(k1, (kh, kw_, cin, cout), jnp.float32, -s, s),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -s, s),
    }


def _linear_init(rng, cin, cout):
    k1, k2 = jax.random.split(rng)
    s = 1.0 / math.sqrt(cin)
    return {
        "w": jax.random.uniform(k1, (cin, cout), jnp.float32, -s, s),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -s, s),
    }


def _ln_init(c):
    return {"gamma": jnp.ones((c,), jnp.float32), "beta": jnp.zeros((c,), jnp.float32)}


def _wn_init(rng, hidden, kernel, n_layers, gin):
    keys = jax.random.split(rng, 2 * n_layers + 1)
    p = {"in": [], "res_skip": [], "cond": None}
    for i in range(n_layers):
        p["in"].append(_conv_init(keys[2 * i], kernel, hidden, 2 * hidden))
        out = 2 * hidden if i < n_layers - 1 else hidden
        p["res_skip"].append(_conv_init(keys[2 * i + 1], 1, hidden, out))
    if gin:
        p["cond"] = _conv_init(keys[-1], 1, gin, 2 * hidden * n_layers)
    return p


def _ddsconv_init(rng, channels, kernel, n_layers):
    keys = jax.random.split(rng, 2 * n_layers)
    layers = []
    for i in range(n_layers):
        layers.append(
            {
                "sep": _conv_init(keys[2 * i], kernel, channels, channels, groups=channels),
                "pw": _conv_init(keys[2 * i + 1], 1, channels, channels),
                "norm1": _ln_init(channels),
                "norm2": _ln_init(channels),
            }
        )
    return {"layers": layers}


def _conv_flow_init(rng, half, filter_channels, kernel, n_layers, num_bins=10):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "pre": _conv_init(k1, 1, half, filter_channels),
        "dds": _ddsconv_init(k2, filter_channels, kernel, n_layers),
        "proj": _conv_init(k3, 1, filter_channels, half * (num_bins * 3 - 1), zero=True),
    }


def _sdp_init(rng, in_channels, kernel, gin, n_flows=4):
    # reference overrides filter_channels = in_channels (models.py:105)
    filt = in_channels
    keys = jax.random.split(rng, 16)
    flows = {
        "ea": {"m": jnp.zeros((2,)), "logs": jnp.zeros((2,))},
        "conv_flows": [_conv_flow_init(keys[i], 1, filt, kernel, 3) for i in range(n_flows)],
    }
    post_flows = {
        "ea": {"m": jnp.zeros((2,)), "logs": jnp.zeros((2,))},
        "conv_flows": [_conv_flow_init(keys[4 + i], 1, filt, kernel, 3) for i in range(4)],
    }
    p = {
        "pre": _conv_init(keys[8], 1, in_channels, filt),
        "proj": _conv_init(keys[9], 1, filt, filt),
        "convs": _ddsconv_init(keys[10], filt, kernel, 3),
        "flows": flows,
        "post_pre": _conv_init(keys[11], 1, 1, filt),
        "post_proj": _conv_init(keys[12], 1, filt, filt),
        "post_convs": _ddsconv_init(keys[13], filt, kernel, 3),
        "post_flows": post_flows,
        "cond": _conv_init(keys[14], 1, gin, filt) if gin else None,
    }
    return p


def _dp_init(rng, in_channels, filter_channels, kernel, gin):
    keys = jax.random.split(rng, 4)
    return {
        "conv1": _conv_init(keys[0], kernel, in_channels, filter_channels),
        "norm1": _ln_init(filter_channels),
        "conv2": _conv_init(keys[1], kernel, filter_channels, filter_channels),
        "norm2": _ln_init(filter_channels),
        "proj": _conv_init(keys[2], 1, filter_channels, 1),
        "cond": _conv_init(keys[3], 1, gin, in_channels) if gin else None,
    }


def _attn_layer_init(rng, hidden, filter_channels, n_heads, kernel, window):
    keys = jax.random.split(rng, 8)
    dk = hidden // n_heads
    rel_std = dk**-0.5
    return {
        "attn": {
            "q": _linear_init(keys[0], hidden, hidden),
            "k": _linear_init(keys[1], hidden, hidden),
            "v": _linear_init(keys[2], hidden, hidden),
            "o": _linear_init(keys[3], hidden, hidden),
            "emb_rel_k": jax.random.normal(keys[4], (2 * window + 1, dk)) * rel_std,
            "emb_rel_v": jax.random.normal(keys[5], (2 * window + 1, dk)) * rel_std,
        },
        "norm1": _ln_init(hidden),
        "ffn": {
            "conv1": _conv_init(keys[6], kernel, hidden, filter_channels),
            "conv2": _conv_init(keys[7], kernel, filter_channels, hidden),
        },
        "norm2": _ln_init(hidden),
    }


def init_synthesizer(rng: jax.Array, cfg: SynthesizerConfig) -> dict:
    """Random-init parameter pytree structurally identical to a checkpoint
    import (ckpt/torch_import.py), so all code paths work without weights."""
    keys = jax.random.split(rng, 24)
    h = cfg.hidden_channels
    inter = cfg.inter_channels
    gin = cfg.gin_channels

    # posterior encoder (models.py:438-446)
    enc_q = {
        "pre": _conv_init(keys[0], 1, cfg.spec_channels, h),
        "wn": _wn_init(keys[1], h, cfg.enc_q_kernel_size, cfg.enc_q_layers, gin),
        "proj": _conv_init(keys[2], 1, h, inter * 2),
    }

    # coupling flow (models.py:448)
    flow_layers = []
    fkeys = jax.random.split(keys[3], cfg.flow_n_flows)
    for i in range(cfg.flow_n_flows):
        k1, k2, k3 = jax.random.split(fkeys[i], 3)
        flow_layers.append(
            {
                "pre": _conv_init(k1, 1, inter // 2, h),
                "wn": _wn_init(k2, h, cfg.flow_kernel_size, cfg.flow_wn_layers, gin),
                "post": _conv_init(k3, 1, h, inter // 2, zero=True),
            }
        )
    flow = {"layers": flow_layers}

    # HiFi-GAN decoder (models.py:428-437)
    ups = []
    resblocks = []
    ukeys = jax.random.split(keys[4], len(cfg.upsample_rates))
    ch = cfg.upsample_initial_channel
    for i, (u, k_up) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin, cout = ch // (2**i), ch // (2 ** (i + 1))
        kk = jax.random.split(ukeys[i], 1 + len(cfg.resblock_kernel_sizes))
        # init_weights: normal(0, 0.01) (commons.py:6-9)
        w = jax.random.normal(kk[0], (k_up, cin, cout)) * 0.01
        ups.append({"w": w, "b": jnp.zeros((cout,))})
        for j, (k_rb, dils) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            rkeys = jax.random.split(kk[1 + j], 2 * len(dils))
            if cfg.resblock == "1":
                rb = {
                    "convs1": [
                        {
                            "w": jax.random.normal(rkeys[2 * d], (k_rb, cout, cout)) * 0.01,
                            "b": jnp.zeros((cout,)),
                        }
                        for d in range(len(dils))
                    ],
                    "convs2": [
                        {
                            "w": jax.random.normal(rkeys[2 * d + 1], (k_rb, cout, cout)) * 0.01,
                            "b": jnp.zeros((cout,)),
                        }
                        for d in range(len(dils))
                    ],
                }
            else:
                rb = {
                    "convs": [
                        {
                            "w": jax.random.normal(rkeys[d], (k_rb, cout, cout)) * 0.01,
                            "b": jnp.zeros((cout,)),
                        }
                        for d in range(len(dils))
                    ]
                }
            resblocks.append(rb)
    dec = {
        "conv_pre": _conv_init(keys[5], 7, inter, cfg.upsample_initial_channel),
        "ups": ups,
        "resblocks": resblocks,
        "conv_post": _conv_init(keys[6], 7, cout, 1, bias=False),
        "cond": _conv_init(keys[7], 1, gin, cfg.upsample_initial_channel) if gin else None,
    }

    params = {"enc_q": enc_q, "flow": flow, "dec": dec}

    if cfg.n_speakers == 0:
        # tone-color reference encoder (models.py:301-364)
        filters = [1, 32, 32, 64, 64, 128, 128]
        ckeys = jax.random.split(keys[8], 6)
        convs = [
            _conv2d_init(ckeys[i], 3, 3, filters[i], filters[i + 1]) for i in range(6)
        ]
        # GRU input size: 128 * (spec_channels reduced by 6 stride-2 convs)
        L = cfg.spec_channels
        for _ in range(6):
            L = (L - 3 + 2 * 1) // 2 + 1
        gkeys = jax.random.split(keys[9], 4)
        s = 1.0 / math.sqrt(128)
        gru = {
            "w_ih": jax.random.uniform(gkeys[0], (128 * L, 3 * 128), jnp.float32, -s, s),
            "w_hh": jax.random.uniform(gkeys[1], (128, 3 * 128), jnp.float32, -s, s),
            "b_ih": jax.random.uniform(gkeys[2], (3 * 128,), jnp.float32, -s, s),
            "b_hh": jax.random.uniform(gkeys[3], (3 * 128,), jnp.float32, -s, s),
        }
        params["ref_enc"] = {
            "layernorm": _ln_init(cfg.spec_channels),
            "convs": convs,
            "gru": gru,
            "proj": _linear_init(keys[10], 128, gin),
        }
    else:
        # text path (models.py:454-464)
        ekeys = jax.random.split(keys[11], cfg.n_layers + 2)
        enc_layers = [
            _attn_layer_init(
                ekeys[i], h, cfg.filter_channels, cfg.n_heads, cfg.kernel_size, cfg.attn_window_size
            )
            for i in range(cfg.n_layers)
        ]
        params["enc_p"] = {
            "emb": jax.random.normal(ekeys[-2], (cfg.n_vocab, h)) * (h**-0.5),
            "encoder": {"layers": enc_layers},
            "proj": _conv_init(ekeys[-1], 1, h, inter * 2),
        }
        params["sdp"] = _sdp_init(keys[12], h, cfg.sdp_kernel_size, gin)
        params["dp"] = _dp_init(keys[13], h, cfg.dp_filter_channels, cfg.dp_kernel_size, gin)
        params["emb_g"] = jax.random.normal(keys[14], (cfg.n_speakers, gin))

    return params


# ---------------------------------------------------------------------------
# Model graphs
# ---------------------------------------------------------------------------

def posterior_encode(
    params: dict,
    cfg: SynthesizerConfig,
    spec: jnp.ndarray,
    spec_mask: jnp.ndarray,
    g: jnp.ndarray | None,
    tau: float | jnp.ndarray,
    noise: jnp.ndarray,
    wn_stack: tuple | None = None,
):
    """spec: [B, T, n_freq] → z, m, logs (each [B, T, inter]).

    z = (m + noise · tau · exp(logs)) · mask  (models.py:212-221); the caller
    supplies `noise` (standard normal) so RNG policy stays external — tau=0
    with zero noise gives the deterministic path used by parity tests.
    wn_stack: optional pre-packed WN weights (make_dec_cache / apply_wn).
    """
    x = conv1d(spec, params["enc_q"]["pre"]["w"], params["enc_q"]["pre"]["b"]) * spec_mask
    x = apply_wn(params["enc_q"]["wn"], x, spec_mask, g=g, stacked=wn_stack)
    stats = conv1d(x, params["enc_q"]["proj"]["w"], params["enc_q"]["proj"]["b"]) * spec_mask
    m, logs = stats[..., : cfg.inter_channels], stats[..., cfg.inter_channels :]
    z = (m + noise * tau * jnp.exp(logs)) * spec_mask
    return z, m, logs


def extract_tone_color(
    params: dict, spec: jnp.ndarray, lengths: jnp.ndarray | None = None
) -> jnp.ndarray:
    """spec: [B, T, n_freq] (+ optional true frame lengths) →
    [B, gin_channels] speaker embedding (ref_enc path, api.py:131)."""
    return apply_reference_encoder(params["ref_enc"], spec, lengths)


def make_dec_cache(params: dict, cfg: SynthesizerConfig, dtype=jnp.bfloat16) -> dict:
    """One-time host-side packing of the serving graph's pre-packed weights.

    Pass the result as `dec_cache` to voice_conversion / tts_decode so the
    serving graph reads pre-packed tensors instead of re-packing per call.
    Besides the decoder's fused-stage weights ("mrf{i}"/"upmrf{i}"/"tail"
    keys — consumed by apply_generator's `packed`), the reserved "wn" key
    carries pre-stacked WaveNet weights for the posterior encoder and each
    coupling layer (~14 MB of per-call stacking copies otherwise)."""
    from openvoice_tpu.nn.hifigan import pack_generator_caches
    from openvoice_tpu.ops.wn_pallas import stack_wn_params

    cache = pack_generator_caches(
        params["dec"],
        resblock_kind=cfg.resblock,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        upsample_rates=cfg.upsample_rates,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
        dtype=dtype,
    )
    cache["wn"] = {
        "enc_q": stack_wn_params(
            params["enc_q"]["wn"], cfg.hidden_channels, dtype=dtype
        ),
        "flow": [
            stack_wn_params(lp["wn"], cfg.hidden_channels, dtype=dtype)
            for lp in params["flow"]["layers"]
        ],
    }
    # whole-direction fused coupling block (ops/coupling_pallas.py): both
    # directions packed with the inter-coupling Flips absorbed into the
    # pre/post matrices
    from openvoice_tpu.ops.coupling_pallas import pack_coupling_block

    cache["coupling"] = {
        "fwd": pack_coupling_block(
            params["flow"], cfg.hidden_channels, reverse=False, dtype=dtype,
            kernel_size=cfg.flow_kernel_size,
        ),
        "rev": pack_coupling_block(
            params["flow"], cfg.hidden_channels, reverse=True, dtype=dtype,
            kernel_size=cfg.flow_kernel_size,
        ),
    }
    return cache


def _use_fused_coupling(x: jnp.ndarray, t_frames: int) -> bool:
    """Serving-mode guard for the whole-direction fused coupling kernel."""
    import jax as _jax

    from openvoice_tpu.ops.coupling_pallas import MAX_FUSED_ROWS

    return (
        x.dtype == jnp.bfloat16
        and _jax.default_backend() == "tpu"
        and t_frames % 8 == 0
        and t_frames <= MAX_FUSED_ROWS
    )


def voice_conversion(
    params: dict,
    cfg: SynthesizerConfig,
    spec: jnp.ndarray,
    spec_lengths: jnp.ndarray,
    g_src: jnp.ndarray,
    g_tgt: jnp.ndarray,
    tau: float | jnp.ndarray,
    noise: jnp.ndarray,
    fast: bool = False,
    dec_cache: dict | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tone-color conversion (models.py:492-499).

    spec: [B, T, n_freq]; g_src/g_tgt: [B, 1, gin]; noise: [B, T, inter].
    Returns (audio [B, T*upsample, 1], y_mask [B, T, 1]).

    zero_g semantics follow the reference exactly: the posterior encoder and
    decoder see zeroed speaker vectors in V2, the flow always sees the real
    src/tgt embeddings (models.py:495-498).

    fast=True runs the FLOP-dominant HiFi-GAN decoder in bfloat16 (the
    serving mode: ~2.1× decoder speedup on v5e, max output error ≲1e-3 on
    [-1, 1] audio); fast=False keeps full-f32 everywhere (the parity mode
    the numerics tests rely on).
    """
    t = spec.shape[1]
    y_mask = sequence_mask(spec_lengths, t)[..., None].astype(spec.dtype)
    audio = voice_conversion_masked(
        params, cfg, spec, y_mask, g_src, g_tgt, tau, noise, fast=fast,
        dec_cache=dec_cache,
    )
    return audio, y_mask


def voice_conversion_masked(
    params: dict,
    cfg: SynthesizerConfig,
    spec: jnp.ndarray,
    y_mask: jnp.ndarray,
    g_src: jnp.ndarray,
    g_tgt: jnp.ndarray,
    tau: float | jnp.ndarray,
    noise: jnp.ndarray,
    fast: bool = False,
    dec_cache: dict | None = None,
) -> jnp.ndarray:
    """Conversion body with an explicit frame mask [B, T, 1] — shared by the
    single-device path and the sequence-parallel path (which builds its mask
    from global frame indices inside each shard)."""
    g_enc = jnp.zeros_like(g_src) if cfg.zero_g else g_src
    g_dec = jnp.zeros_like(g_tgt) if cfg.zero_g else g_tgt

    if fast:
        # serving mode: the whole post-STFT graph runs bf16 — the flows'
        # bf16 rounding (~3e-3 relative) is far below the intentional
        # sampling noise injected at tau (api.py:141 default 0.3)
        to_bf16 = lambda a: a.astype(jnp.bfloat16)
        enc_flow_params = jax.tree.map(
            to_bf16, {"enc_q": params["enc_q"], "flow": params["flow"]}
        )
        spec, y_mask, noise = to_bf16(spec), to_bf16(y_mask), to_bf16(noise)
        g_src, g_tgt = to_bf16(g_src), to_bf16(g_tgt)
        g_enc, g_dec = to_bf16(g_enc), to_bf16(g_dec)
        tau = jnp.asarray(tau, jnp.bfloat16)
    else:
        enc_flow_params = params

    wn_cache = dec_cache.get("wn") if (fast and dec_cache is not None) else None
    z, _, _ = posterior_encode(
        enc_flow_params, cfg, spec, y_mask, g_enc, tau, noise,
        wn_stack=wn_cache["enc_q"] if wn_cache else None,
    )

    cpl_cache = dec_cache.get("coupling") if (fast and dec_cache is not None) else None
    t_frames = spec.shape[1]
    if cpl_cache is not None and _use_fused_coupling(z, t_frames):
        from openvoice_tpu.ops.coupling_pallas import (
            coupling_g_stack,
            fused_coupling_block,
        )

        lengths = jnp.sum(y_mask[:, :, 0].astype(jnp.int32), axis=1)
        flow_p = enc_flow_params["flow"]
        g_fwd = coupling_g_stack(flow_p, g_src, reverse=False, dtype=z.dtype)
        g_rev = coupling_g_stack(flow_p, g_tgt, reverse=True, dtype=z.dtype)
        z_p = fused_coupling_block(
            z, lengths, cpl_cache["fwd"], g_fwd, kernel_size=cfg.flow_kernel_size
        )
        z_hat = fused_coupling_block(
            z_p, lengths, cpl_cache["rev"], g_rev, kernel_size=cfg.flow_kernel_size
        )
    else:
        flow_stacks = wn_cache["flow"] if wn_cache else None
        z_p = apply_coupling_block(
            enc_flow_params["flow"], z, y_mask, g=g_src, reverse=False,
            wn_stacks=flow_stacks,
        )
        z_hat = apply_coupling_block(
            enc_flow_params["flow"], z_p, y_mask, g=g_tgt, reverse=True,
            wn_stacks=flow_stacks,
        )

    dec_params, x_dec = params["dec"], z_hat * y_mask
    mask_dec = y_mask
    if fast:
        dec_params = jax.tree.map(to_bf16, dec_params)
    audio = apply_generator(
        dec_params,
        x_dec,
        resblock_kind=cfg.resblock,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        upsample_rates=cfg.upsample_rates,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
        g=g_dec,
        x_mask=mask_dec,
        packed=dec_cache if fast else None,
    )
    return audio.astype(jnp.float32)


class TTSEncodeOut(NamedTuple):
    """Static-shape output of the text-side stage of TTS inference."""

    m_p: jnp.ndarray  # [B, T_x, inter]
    logs_p: jnp.ndarray  # [B, T_x, inter]
    x_mask: jnp.ndarray  # [B, T_x, 1]
    w_ceil: jnp.ndarray  # [B, T_x] integral durations
    g: jnp.ndarray | None  # [B, 1, gin]


def tts_encode(
    params: dict,
    cfg: SynthesizerConfig,
    tokens: jnp.ndarray,
    token_lengths: jnp.ndarray,
    sid: jnp.ndarray | None,
    rng: jax.Array | None,
    noise_scale_w: float = 0.6,
    length_scale: float = 1.0,
    sdp_ratio: float = 0.2,
    noise_w: jnp.ndarray | None = None,
) -> TTSEncodeOut:
    """Text encoder + duration predictors → integral durations
    (first half of models.py:467-482, up to the data-dependent length).

    tokens: [B, T_x] int32.  Jittable: output shapes depend only on T_x.
    noise_w ([B, T_x, 2]) overrides the sdp noise draw — the batched TTS
    path stacks per-sentence draws so batching reproduces the sequential
    path exactly.
    """
    t_x = tokens.shape[1]
    x_mask = sequence_mask(token_lengths, t_x)[..., None].astype(jnp.float32)

    h = params["enc_p"]["emb"][tokens] * math.sqrt(cfg.hidden_channels)
    h = apply_encoder(
        params["enc_p"]["encoder"],
        h * x_mask,
        x_mask,
        n_heads=cfg.n_heads,
        kernel_size=cfg.kernel_size,
        window_size=cfg.attn_window_size,
    )
    stats = conv1d(h, params["enc_p"]["proj"]["w"], params["enc_p"]["proj"]["b"]) * x_mask
    m_p, logs_p = stats[..., : cfg.inter_channels], stats[..., cfg.inter_channels :]

    if cfg.n_speakers > 0 and sid is not None:
        g = params["emb_g"][sid][:, None, :]  # [B, 1, gin]
    else:
        g = None

    logw_sdp = apply_sdp_reverse(
        params["sdp"], h, x_mask, g=g, noise_scale=noise_scale_w, rng=rng,
        noise=noise_w,
    )
    logw_dp = apply_duration_predictor(params["dp"], h, x_mask, g=g)
    logw = logw_sdp * sdp_ratio + logw_dp * (1.0 - sdp_ratio)
    w = jnp.exp(logw) * x_mask * length_scale
    w_ceil = jnp.ceil(w)[..., 0]  # [B, T_x]
    return TTSEncodeOut(m_p=m_p, logs_p=logs_p, x_mask=x_mask, w_ceil=w_ceil, g=g)


def tts_decode(
    params: dict,
    cfg: SynthesizerConfig,
    enc: TTSEncodeOut,
    max_frames: int,
    noise: jnp.ndarray,
    noise_scale: float = 0.667,
    fast: bool = False,
    dec_cache: dict | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Length-regulate + reverse flow + decode, padded to static `max_frames`
    (second half of models.py:479-490).

    noise: [B, max_frames, inter] standard normal.  fast=True: bf16 flow +
    decoder (the serving mode; f32 is the parity default).
    Returns (audio [B, max_frames·upsample, 1], y_mask [B, max_frames, 1]).
    """
    y_lengths = jnp.clip(jnp.sum(enc.w_ceil, axis=-1), 1, max_frames).astype(jnp.int32)
    y_mask = sequence_mask(y_lengths, max_frames)[..., None].astype(enc.m_p.dtype)
    attn_mask = y_mask * jnp.swapaxes(enc.x_mask, 1, 2)  # [B, T_y, T_x]
    attn = generate_path(enc.w_ceil, attn_mask)  # [B, T_y, T_x]

    m_p = jnp.einsum("byt,btc->byc", attn, enc.m_p, precision=None)
    logs_p = jnp.einsum("byt,btc->byc", attn, enc.logs_p, precision=None)

    z_p = m_p + noise * jnp.exp(logs_p) * noise_scale
    g = enc.g
    flow_params, dec_params = params["flow"], params["dec"]
    if fast:
        to_bf16 = lambda a: a.astype(jnp.bfloat16)
        flow_params = jax.tree.map(to_bf16, flow_params)
        dec_params = jax.tree.map(to_bf16, dec_params)
        z_p, y_mask = to_bf16(z_p), to_bf16(y_mask)
        g = to_bf16(g) if g is not None else None
    wn_cache = dec_cache.get("wn") if (fast and dec_cache is not None) else None
    cpl_cache = dec_cache.get("coupling") if (fast and dec_cache is not None) else None
    if cpl_cache is not None and g is not None and _use_fused_coupling(z_p, max_frames):
        from openvoice_tpu.ops.coupling_pallas import (
            coupling_g_stack,
            fused_coupling_block,
        )

        g_rev = coupling_g_stack(flow_params, g, reverse=True, dtype=z_p.dtype)
        z = fused_coupling_block(
            z_p * y_mask, y_lengths, cpl_cache["rev"], g_rev,
            kernel_size=cfg.flow_kernel_size,
        )
    else:
        z = apply_coupling_block(
            flow_params, z_p, y_mask, g=g, reverse=True,
            wn_stacks=wn_cache["flow"] if wn_cache else None,
        )
    audio = apply_generator(
        dec_params,
        z * y_mask,
        resblock_kind=cfg.resblock,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        upsample_rates=cfg.upsample_rates,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
        g=g,
        x_mask=y_mask,
        packed=dec_cache if fast else None,
    )
    # y_mask back to f32: callers sum it to recover lengths (infer below),
    # and bf16 integer counts are wrong past 256
    return audio.astype(jnp.float32), y_mask.astype(jnp.float32)


def tts_decode_convert(
    tts_params: dict,
    cfg: SynthesizerConfig,
    enc: TTSEncodeOut,
    max_frames: int,
    noise_dec: jnp.ndarray,
    conv_params: dict,
    conv_cfg: SynthesizerConfig,
    g_src: jnp.ndarray,
    g_tgt: jnp.ndarray,
    tau: float | jnp.ndarray,
    noise_conv: jnp.ndarray,
    noise_scale: float = 0.667,
    fast: bool = False,
    tts_dec_cache: dict | None = None,
    conv_dec_cache: dict | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """TTS decode → STFT → tone conversion as ONE graph (the served
    tts-then-convert chain, reference openvoice_app.py:131-141, without the
    base audio ever leaving the device).

    Two dispatches and one device→host readback are removed per request vs
    the staged path — decisive under remote-dispatch tunnels where each
    round trip costs ~100 ms (docs/BENCH.md; the staged e2e measured 6.7
    audio-s/s wall-clock against ~1800 for the device graph alone).

    The base audio's per-row true length (y_frames · upsample) drives an
    in-graph per-row reflect STFT (audio/stft.py::masked_linear_spectrogram)
    whose framing matches the host `convert()` path exactly; requires
    `cfg.upsample_factor == conv_cfg.hop_length` so base frames map 1:1 to
    conversion frames (true for the shipped config pair).

    Returns (converted audio [B, max_frames·up, 1], y_mask [B, max_frames, 1]).
    """
    assert cfg.upsample_factor == conv_cfg.hop_length, (
        "fused tts→convert needs TTS upsample == converter hop "
        f"({cfg.upsample_factor} vs {conv_cfg.hop_length})"
    )
    from openvoice_tpu.audio.stft import masked_linear_spectrogram

    audio, y_mask = tts_decode(
        tts_params, cfg, enc, max_frames, noise_dec, noise_scale=noise_scale,
        fast=fast, dec_cache=tts_dec_cache,
    )
    y_frames = jnp.sum(y_mask[..., 0], axis=-1).astype(jnp.int32)
    samples = y_frames * cfg.upsample_factor
    spec = masked_linear_spectrogram(
        audio[..., 0], samples,
        conv_cfg.filter_length, conv_cfg.hop_length, conv_cfg.win_length,
    )  # [B, max_frames, n_freq]
    conv_audio, _ = voice_conversion(
        conv_params, conv_cfg, spec, y_frames, g_src, g_tgt, tau, noise_conv,
        fast=fast, dec_cache=conv_dec_cache,
    )
    return conv_audio, y_mask


def tts_synthesize_convert(
    params: dict,
    cfg: SynthesizerConfig,
    tokens: jnp.ndarray,
    token_lengths: jnp.ndarray,
    sid: jnp.ndarray,
    noise_w: jnp.ndarray,
    max_frames: int,
    noise_dec: jnp.ndarray,
    conv_params: dict,
    conv_cfg: SynthesizerConfig,
    g_src: jnp.ndarray,
    g_tgt: jnp.ndarray,
    tau: float | jnp.ndarray,
    noise_conv: jnp.ndarray,
    noise_scale: float = 0.667,
    noise_scale_w: float = 0.6,
    length_scale: float = 1.0,
    sdp_ratio: float = 0.2,
    fast: bool = False,
    tts_dec_cache: dict | None = None,
    conv_dec_cache: dict | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Text → cloned audio as ONE graph: encode + duration + decode + STFT
    + conversion, with the data-dependent output length capped at the
    static `max_frames` (the reference's own `max_len` truncation precedent,
    models.py:467,489).  Removes the encode dispatch + w_ceil readback the
    two-stage split pays — decisive under remote-dispatch tunnels.

    Returns (conv_audio [B, max_frames·up, 1], y_frames [B] int32 ACTUAL
    decoded frames, total_frames [B] int32 UNCAPPED duration sums — rows
    where total > max_frames were truncated and the caller re-runs them
    through the two-stage path).
    """
    enc = tts_encode(
        params, cfg, tokens, token_lengths, sid, None,
        noise_scale_w=noise_scale_w, length_scale=length_scale,
        sdp_ratio=sdp_ratio, noise_w=noise_w,
    )
    total = jnp.sum(enc.w_ceil, axis=-1).astype(jnp.int32)  # [B] uncapped
    audio, y_mask = tts_decode_convert(
        params, cfg, enc, max_frames, noise_dec, conv_params, conv_cfg,
        g_src, g_tgt, tau, noise_conv, noise_scale=noise_scale, fast=fast,
        tts_dec_cache=tts_dec_cache, conv_dec_cache=conv_dec_cache,
    )
    y_frames = jnp.sum(y_mask[..., 0], axis=-1).astype(jnp.int32)
    return audio, y_frames, total


# jitted stage wrappers: one compiled program per (cfg, token-bucket) /
# (cfg, frame-bucket); sampling knobs stay traced so changing them is free
tts_encode_jit = jax.jit(tts_encode, static_argnames=("cfg",))
tts_decode_jit = jax.jit(tts_decode, static_argnames=("cfg", "max_frames", "fast"))
voice_conversion_jit = jax.jit(voice_conversion, static_argnames=("cfg", "fast"))
tts_decode_convert_jit = jax.jit(
    tts_decode_convert,
    static_argnames=("cfg", "max_frames", "conv_cfg", "fast"),
)
tts_synthesize_convert_jit = jax.jit(
    tts_synthesize_convert,
    static_argnames=("cfg", "max_frames", "conv_cfg", "fast"),
)


def infer(
    params: dict,
    cfg: SynthesizerConfig,
    tokens: jnp.ndarray,
    token_lengths: jnp.ndarray,
    sid: jnp.ndarray | None,
    rng: jax.Array,
    noise_scale: float = 0.667,
    length_scale: float = 1.0,
    noise_scale_w: float = 0.6,
    sdp_ratio: float = 0.2,
    max_frames: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Convenience two-stage TTS (host round-trip for the dynamic output
    length, mirroring the natural split at models.py:479).  For production
    batched serving use tts_encode/tts_decode with bucketing directly."""
    rng_w, rng_y = jax.random.split(rng)
    enc = tts_encode_jit(
        params, cfg, tokens, token_lengths, sid, rng_w,
        noise_scale_w=noise_scale_w, length_scale=length_scale, sdp_ratio=sdp_ratio,
    )
    if max_frames is None:
        total = int(jnp.max(jnp.sum(enc.w_ceil, axis=-1)))
        from openvoice_tpu.runtime.bucketing import round_up_to_bucket

        max_frames = round_up_to_bucket(max(total, 1))
    # decode noise drawn host-side: an eager jax.random.normal is a blocking
    # first-use device round-trip (minutes through remote-dispatch tunnels);
    # the numpy stream is seeded from the key so determinism is kept
    host_rng = np.random.default_rng(np.asarray(rng_y, np.uint32))
    noise = jnp.asarray(host_rng.standard_normal(
        (tokens.shape[0], max_frames, cfg.inter_channels)).astype(np.float32))
    audio, y_mask = tts_decode_jit(params, cfg, enc, max_frames, noise, noise_scale=noise_scale)
    y_lengths = np.asarray(jnp.sum(y_mask[..., 0], axis=-1)).astype(np.int64)
    return np.asarray(audio[..., 0]), y_lengths * cfg.upsample_factor
