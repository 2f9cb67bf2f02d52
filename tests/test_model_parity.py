"""Numerical parity of the JAX synthesizer vs the torch reference oracle.

Strategy (SURVEY.md §4): random-init the torch model, import its state_dict
through ckpt/torch_import (weight-norm folding + layout conversion), run both
on the same inputs with all stochastic knobs zeroed (tau=0, noise_scale=0 —
models.py:220,487 make those paths deterministic), and compare.
"""

import numpy as np
import pytest
import torch

from tests import oracle
from tests.oracle import SMALL_CONVERTER, SMALL_TTS

import jax
import jax.numpy as jnp

from openvoice_tpu.ckpt.torch_import import import_synthesizer
from openvoice_tpu.models import synthesizer as S

ATOL_LATENT = 2e-4
ATOL_AUDIO = 5e-4


@pytest.fixture(scope="module")
def converter():
    model = oracle.build_torch_synthesizer()
    cfg = oracle.jax_config_for(SMALL_CONVERTER)
    params, report = import_synthesizer(oracle.state_dict_numpy(model), cfg)
    assert not report["missing"], report["missing"]
    return model, cfg, params


@pytest.fixture(scope="module")
def tts_model():
    model = oracle.build_torch_synthesizer(SMALL_TTS)
    cfg = oracle.jax_config_for(SMALL_TTS)
    params, report = import_synthesizer(oracle.state_dict_numpy(model), cfg)
    assert not report["missing"], report["missing"]
    return model, cfg, params


def _rand_spec(b, f, t, seed=0):
    rng = np.random.default_rng(seed)
    return np.abs(rng.standard_normal((b, f, t))).astype(np.float32)


def test_import_has_no_unexpected_keys(converter):
    model, cfg, _ = converter
    _, report = import_synthesizer(oracle.state_dict_numpy(model), cfg)
    # emb_rel position buffers etc. should all be consumed
    assert report["unexpected"] == [], report["unexpected"]


def test_posterior_encoder_parity(converter):
    model, cfg, params = converter
    b, t = 2, 40
    spec = _rand_spec(b, cfg.spec_channels, t)
    lengths = np.array([t, t - 7], np.int64)
    g = np.random.default_rng(1).standard_normal((b, cfg.gin_channels, 1)).astype(np.float32)

    with torch.no_grad():
        z_t, m_t, logs_t, mask_t = model.enc_q(
            torch.from_numpy(spec), torch.from_numpy(lengths), g=torch.from_numpy(g), tau=0.0
        )

    mask_j = S.sequence_mask(jnp.asarray(lengths), t)[..., None].astype(jnp.float32)
    z_j, m_j, logs_j = S.posterior_encode(
        params, cfg, jnp.swapaxes(jnp.asarray(spec), 1, 2), mask_j,
        jnp.swapaxes(jnp.asarray(g), 1, 2), 0.0, jnp.zeros((b, t, cfg.inter_channels)),
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(m_j), 1, 2), m_t.numpy(), atol=ATOL_LATENT
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(z_j), 1, 2), z_t.numpy(), atol=ATOL_LATENT
    )


def test_flow_forward_reverse_parity(converter):
    model, cfg, params = converter
    b, t = 2, 40
    rng = np.random.default_rng(2)
    z = rng.standard_normal((b, cfg.inter_channels, t)).astype(np.float32)
    g = rng.standard_normal((b, cfg.gin_channels, 1)).astype(np.float32)
    mask = np.ones((b, 1, t), np.float32)

    with torch.no_grad():
        zp_t = model.flow(torch.from_numpy(z), torch.from_numpy(mask), g=torch.from_numpy(g))
        zrt = model.flow(zp_t, torch.from_numpy(mask), g=torch.from_numpy(g), reverse=True)

    from openvoice_tpu.nn.flows import apply_coupling_block

    mask_j = jnp.swapaxes(jnp.asarray(mask), 1, 2)
    zp_j = apply_coupling_block(
        params["flow"], jnp.swapaxes(jnp.asarray(z), 1, 2), mask_j,
        g=jnp.swapaxes(jnp.asarray(g), 1, 2), reverse=False,
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(zp_j), 1, 2), zp_t.numpy(), atol=ATOL_LATENT
    )
    zr_j = apply_coupling_block(
        params["flow"], zp_j, mask_j, g=jnp.swapaxes(jnp.asarray(g), 1, 2), reverse=True
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(zr_j), 1, 2), zrt.numpy(), atol=ATOL_LATENT
    )
    # flow must invert itself
    np.testing.assert_allclose(np.asarray(zr_j), np.swapaxes(z, 1, 2), atol=1e-3)


def test_generator_parity(converter):
    model, cfg, params = converter
    b, t = 1, 24
    rng = np.random.default_rng(3)
    z = rng.standard_normal((b, cfg.inter_channels, t)).astype(np.float32)
    g = rng.standard_normal((b, cfg.gin_channels, 1)).astype(np.float32)

    with torch.no_grad():
        audio_t = model.dec(torch.from_numpy(z), g=torch.from_numpy(g)).numpy()

    from openvoice_tpu.nn.hifigan import apply_generator

    audio_j = apply_generator(
        params["dec"],
        jnp.swapaxes(jnp.asarray(z), 1, 2),
        resblock_kind=cfg.resblock,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        upsample_rates=cfg.upsample_rates,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
        g=jnp.swapaxes(jnp.asarray(g), 1, 2),
    )
    assert audio_j.shape == (b, t * cfg.upsample_factor, 1)
    np.testing.assert_allclose(
        np.asarray(audio_j)[..., 0], audio_t[:, 0], atol=ATOL_AUDIO
    )


def test_reference_encoder_parity(converter):
    model, cfg, params = converter
    b, t = 3, 100
    spec = _rand_spec(b, cfg.spec_channels, t, seed=4)

    with torch.no_grad():
        se_t = model.ref_enc(torch.from_numpy(spec).transpose(1, 2)).numpy()

    se_j = S.extract_tone_color(params, jnp.swapaxes(jnp.asarray(spec), 1, 2))
    assert se_j.shape == (b, cfg.gin_channels)
    np.testing.assert_allclose(np.asarray(se_j), se_t, atol=ATOL_LATENT)


def test_reference_encoder_padded_batch_parity(converter):
    """A bucket-padded, length-aware batch must reproduce per-clip
    exact-length results (the reference loops clips one at a time,
    api.py:122-131; we batch them into one graph)."""
    model, cfg, params = converter
    lengths = [100, 77, 53]
    t_pad = 128
    specs = [_rand_spec(1, cfg.spec_channels, L, seed=40 + i)[0] for i, L in enumerate(lengths)]

    se_torch = []
    with torch.no_grad():
        for s in specs:
            se_torch.append(model.ref_enc(torch.from_numpy(s[None]).transpose(1, 2)).numpy()[0])

    batch = np.zeros((3, t_pad, cfg.spec_channels), np.float32)
    for i, s in enumerate(specs):
        batch[i, : s.shape[1]] = s.T
    se_j = S.extract_tone_color(params, jnp.asarray(batch), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(se_j), np.stack(se_torch), atol=ATOL_LATENT)


def test_voice_conversion_end_to_end_parity(converter):
    model, cfg, params = converter
    b, t = 1, 50
    spec = _rand_spec(b, cfg.spec_channels, t, seed=5)
    lengths = np.array([t], np.int64)
    rng = np.random.default_rng(6)
    g_src = rng.standard_normal((b, cfg.gin_channels, 1)).astype(np.float32)
    g_tgt = rng.standard_normal((b, cfg.gin_channels, 1)).astype(np.float32)

    with torch.no_grad():
        audio_t = model.voice_conversion(
            torch.from_numpy(spec), torch.from_numpy(lengths),
            torch.from_numpy(g_src), torch.from_numpy(g_tgt), tau=0.0,
        )[0].numpy()

    audio_j, _ = S.voice_conversion(
        params, cfg,
        jnp.swapaxes(jnp.asarray(spec), 1, 2), jnp.asarray(lengths),
        jnp.swapaxes(jnp.asarray(g_src), 1, 2), jnp.swapaxes(jnp.asarray(g_tgt), 1, 2),
        0.0, jnp.zeros((b, t, cfg.inter_channels)),
    )
    np.testing.assert_allclose(np.asarray(audio_j)[..., 0], audio_t[:, 0], atol=ATOL_AUDIO)


def test_voice_conversion_padded_matches_exact_length(converter):
    """Bucket-padded conversion must equal the exact-length reference run —
    this is what makes static-shape serving numerically exact."""
    model, cfg, params = converter
    t_true, t_pad = 37, 48
    spec = _rand_spec(1, cfg.spec_channels, t_true, seed=21)
    rng = np.random.default_rng(22)
    g_src = rng.standard_normal((1, cfg.gin_channels, 1)).astype(np.float32)
    g_tgt = rng.standard_normal((1, cfg.gin_channels, 1)).astype(np.float32)

    with torch.no_grad():
        audio_t = model.voice_conversion(
            torch.from_numpy(spec), torch.from_numpy(np.array([t_true])),
            torch.from_numpy(g_src), torch.from_numpy(g_tgt), tau=0.0,
        )[0].numpy()

    spec_pad = np.zeros((1, cfg.spec_channels, t_pad), np.float32)
    spec_pad[:, :, :t_true] = spec
    audio_j, _ = S.voice_conversion(
        params, cfg,
        jnp.swapaxes(jnp.asarray(spec_pad), 1, 2), jnp.asarray([t_true]),
        jnp.swapaxes(jnp.asarray(g_src), 1, 2), jnp.swapaxes(jnp.asarray(g_tgt), 1, 2),
        0.0, jnp.zeros((1, t_pad, cfg.inter_channels)),
    )
    valid = t_true * cfg.upsample_factor
    np.testing.assert_allclose(
        np.asarray(audio_j)[0, :valid, 0], audio_t[0, 0], atol=ATOL_AUDIO
    )
    # padded tail is silent beyond conv_post's receptive-field spill (k=7 ⇒ 3)
    assert np.abs(np.asarray(audio_j)[0, valid + 3 :, 0]).max() == 0.0


def test_voice_conversion_zero_g_parity():
    model = oracle.build_torch_synthesizer({"zero_g": True}, seed=7)
    kw = dict(SMALL_CONVERTER, zero_g=True)
    cfg = oracle.jax_config_for(kw)
    params, _ = import_synthesizer(oracle.state_dict_numpy(model), cfg)

    b, t = 1, 30
    spec = _rand_spec(b, cfg.spec_channels, t, seed=8)
    lengths = np.array([t], np.int64)
    rng = np.random.default_rng(9)
    g_src = rng.standard_normal((b, cfg.gin_channels, 1)).astype(np.float32)
    g_tgt = rng.standard_normal((b, cfg.gin_channels, 1)).astype(np.float32)

    with torch.no_grad():
        audio_t = model.voice_conversion(
            torch.from_numpy(spec), torch.from_numpy(lengths),
            torch.from_numpy(g_src), torch.from_numpy(g_tgt), tau=0.0,
        )[0].numpy()

    audio_j, _ = S.voice_conversion(
        params, cfg,
        jnp.swapaxes(jnp.asarray(spec), 1, 2), jnp.asarray(lengths),
        jnp.swapaxes(jnp.asarray(g_src), 1, 2), jnp.swapaxes(jnp.asarray(g_tgt), 1, 2),
        0.0, jnp.zeros((b, t, cfg.inter_channels)),
    )
    np.testing.assert_allclose(np.asarray(audio_j)[..., 0], audio_t[:, 0], atol=ATOL_AUDIO)


# ---------------------------------------------------------------------------
# TTS path
# ---------------------------------------------------------------------------

def test_text_encoder_parity(tts_model):
    model, cfg, params = tts_model
    b, t = 2, 25
    rng = np.random.default_rng(10)
    tokens = rng.integers(0, cfg.n_vocab, (b, t)).astype(np.int64)
    lengths = np.array([t, t - 6], np.int64)

    with torch.no_grad():
        x_t, m_t, logs_t, mask_t = model.enc_p(
            torch.from_numpy(tokens), torch.from_numpy(lengths)
        )

    import math

    from openvoice_tpu.nn.attention import apply_encoder
    from openvoice_tpu.nn.conv import conv1d

    x_mask = S.sequence_mask(jnp.asarray(lengths), t)[..., None].astype(jnp.float32)
    h = params["enc_p"]["emb"][jnp.asarray(tokens)] * math.sqrt(cfg.hidden_channels)
    h = apply_encoder(
        params["enc_p"]["encoder"], h * x_mask, x_mask,
        n_heads=cfg.n_heads, kernel_size=cfg.kernel_size, window_size=cfg.attn_window_size,
    )
    stats = conv1d(h, params["enc_p"]["proj"]["w"], params["enc_p"]["proj"]["b"]) * x_mask
    m_j = stats[..., : cfg.inter_channels]

    np.testing.assert_allclose(
        np.swapaxes(np.asarray(h), 1, 2), x_t.numpy(), atol=ATOL_LATENT
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(m_j), 1, 2), m_t.numpy(), atol=ATOL_LATENT
    )


def test_relative_attention_short_sequence(tts_model):
    """T < window_size+1 exercises the reference's center-slice path
    (attentions.py:343-359)."""
    model, cfg, params = tts_model
    b, t = 1, 3
    tokens = np.array([[1, 2, 3]], np.int64)
    lengths = np.array([t], np.int64)
    with torch.no_grad():
        x_t = model.enc_p(torch.from_numpy(tokens), torch.from_numpy(lengths))[0]

    import math

    from openvoice_tpu.nn.attention import apply_encoder

    x_mask = S.sequence_mask(jnp.asarray(lengths), t)[..., None].astype(jnp.float32)
    h = params["enc_p"]["emb"][jnp.asarray(tokens)] * math.sqrt(cfg.hidden_channels)
    h = apply_encoder(
        params["enc_p"]["encoder"], h * x_mask, x_mask,
        n_heads=cfg.n_heads, kernel_size=cfg.kernel_size, window_size=cfg.attn_window_size,
    )
    np.testing.assert_allclose(np.swapaxes(np.asarray(h), 1, 2), x_t.numpy(), atol=ATOL_LATENT)


def test_duration_predictor_parity(tts_model):
    model, cfg, params = tts_model
    b, t = 2, 25
    rng = np.random.default_rng(11)
    x = rng.standard_normal((b, cfg.hidden_channels, t)).astype(np.float32)
    g = rng.standard_normal((b, cfg.gin_channels, 1)).astype(np.float32)
    mask = np.ones((b, 1, t), np.float32)

    with torch.no_grad():
        logw_t = model.dp(torch.from_numpy(x), torch.from_numpy(mask), g=torch.from_numpy(g)).numpy()

    from openvoice_tpu.nn.duration import apply_duration_predictor

    logw_j = apply_duration_predictor(
        params["dp"], jnp.swapaxes(jnp.asarray(x), 1, 2),
        jnp.swapaxes(jnp.asarray(mask), 1, 2), g=jnp.swapaxes(jnp.asarray(g), 1, 2),
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(logw_j), 1, 2), logw_t, atol=ATOL_LATENT
    )


def test_sdp_reverse_parity_zero_noise(tts_model):
    model, cfg, params = tts_model
    b, t = 2, 25
    rng = np.random.default_rng(12)
    x = rng.standard_normal((b, cfg.hidden_channels, t)).astype(np.float32)
    g = rng.standard_normal((b, cfg.gin_channels, 1)).astype(np.float32)
    mask = np.ones((b, 1, t), np.float32)

    with torch.no_grad():
        logw_t = model.sdp(
            torch.from_numpy(x), torch.from_numpy(mask), g=torch.from_numpy(g),
            reverse=True, noise_scale=0.0,
        ).numpy()

    from openvoice_tpu.nn.duration import apply_sdp_reverse

    logw_j = apply_sdp_reverse(
        params["sdp"], jnp.swapaxes(jnp.asarray(x), 1, 2),
        jnp.swapaxes(jnp.asarray(mask), 1, 2), g=jnp.swapaxes(jnp.asarray(g), 1, 2),
        noise_scale=0.0, noise=jnp.zeros((b, t, 2)),
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(logw_j), 1, 2), logw_t, atol=ATOL_LATENT
    )


def test_tts_infer_end_to_end_parity(tts_model):
    model, cfg, params = tts_model
    b, t = 1, 15
    rng = np.random.default_rng(13)
    tokens = rng.integers(1, cfg.n_vocab, (b, t)).astype(np.int64)
    lengths = np.array([t], np.int64)
    sid = np.array([2], np.int64)

    with torch.no_grad():
        audio_t, attn_t, y_mask_t, _ = model.infer(
            torch.from_numpy(tokens), torch.from_numpy(lengths),
            sid=torch.from_numpy(sid), noise_scale=0.0, noise_scale_w=0.0,
            length_scale=1.0, sdp_ratio=0.2,
        )
    audio_t = audio_t.numpy()

    enc = S.tts_encode(
        params, cfg, jnp.asarray(tokens), jnp.asarray(lengths), jnp.asarray(sid),
        jax.random.PRNGKey(0), noise_scale_w=0.0, length_scale=1.0, sdp_ratio=0.2,
    )
    y_len = int(np.sum(np.asarray(enc.w_ceil)))
    assert y_len == audio_t.shape[-1] // cfg.upsample_factor, (
        "duration mismatch vs torch"
    )
    max_frames = y_len + 8  # deliberately padded: masking must keep parity
    audio_j, y_mask_j = S.tts_decode(
        params, cfg, enc, max_frames,
        jnp.zeros((b, max_frames, cfg.inter_channels)), noise_scale=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(audio_j)[0, : audio_t.shape[-1], 0], audio_t[0, 0], atol=ATOL_AUDIO
    )
