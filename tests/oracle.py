"""Torch-reference oracle helpers for parity tests.

Builds the upstream model (imported from the read-only reference tree — never
copied) with random weights, and exposes its state_dict for our importer.
Small configs keep CPU runtime reasonable; enc_q(16 WN layers) and
flow(4x4) depths are fixed by the reference ctor (models.py:438-448).
"""

from __future__ import annotations

import numpy as np

from tests.conftest import add_reference_to_path

add_reference_to_path()

import torch  # noqa: E402

torch.manual_seed(0)

SMALL_CONVERTER = dict(
    n_vocab=0,
    spec_channels=129,
    inter_channels=64,
    hidden_channels=64,
    filter_channels=128,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.0,
    resblock="1",
    resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    upsample_rates=(4, 4),
    upsample_initial_channel=128,
    upsample_kernel_sizes=(8, 8),
    n_speakers=0,
    gin_channels=32,
)

SMALL_TTS = dict(SMALL_CONVERTER, n_vocab=20, n_speakers=4)


def build_torch_synthesizer(overrides: dict | None = None, seed: int = 0):
    from openvoice.models import SynthesizerTrn  # reference oracle

    kw = dict(SMALL_CONVERTER)
    if overrides:
        kw = dict(kw, **overrides)
    torch.manual_seed(seed)
    model = SynthesizerTrn(
        kw.pop("n_vocab"),
        kw.pop("spec_channels"),
        **{k: (list(v) if isinstance(v, tuple) else v) for k, v in kw.items()},
    )
    model.eval()
    return model


def state_dict_numpy(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def jax_config_for(kw: dict):
    from openvoice_tpu.config import SynthesizerConfig

    return SynthesizerConfig(
        n_vocab=kw["n_vocab"],
        spec_channels=kw["spec_channels"],
        inter_channels=kw["inter_channels"],
        hidden_channels=kw["hidden_channels"],
        filter_channels=kw["filter_channels"],
        n_heads=kw["n_heads"],
        n_layers=kw["n_layers"],
        kernel_size=kw["kernel_size"],
        p_dropout=kw["p_dropout"],
        resblock=kw["resblock"],
        resblock_kernel_sizes=tuple(kw["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(tuple(d) for d in kw["resblock_dilation_sizes"]),
        upsample_rates=tuple(kw["upsample_rates"]),
        upsample_initial_channel=kw["upsample_initial_channel"],
        upsample_kernel_sizes=tuple(kw["upsample_kernel_sizes"]),
        n_speakers=kw["n_speakers"],
        gin_channels=kw["gin_channels"],
        zero_g=kw.get("zero_g", False),
    )
