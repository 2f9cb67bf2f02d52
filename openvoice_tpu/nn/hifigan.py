"""HiFi-GAN generator (reference: models.py:224-298, modules.py:221-360).

The FLOP-dominant stage: operates at audio rate after the transposed-conv
upsamples (8·8·2·2 = 256×).  TPU design:

* [B, T, C] layout → every conv is an MXU implicit-GEMM; leaky-relu epilogues
  fuse into the convs.
* ConvTranspose1d is expressed as lhs-dilated conv (see nn/conv.py) — XLA
  turns the stride-u dilation + kernel into interleaved phase matmuls; no
  scatter.
* The multi-receptive-field (MRF) fusion is the arithmetic mean of
  `num_kernels` ResBlocks (models.py:280-286); all branches read the same
  activation, so XLA schedules them over resident VMEM tiles.

All static structure (kernel sizes, dilations, strides) comes from the
function arguments / config — param pytrees hold arrays only.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from openvoice_tpu.nn.conv import conv1d, conv_transpose1d

LRELU_SLOPE = 0.1


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def apply_resblock1(
    params: dict,
    x: jnp.ndarray,
    dilations: Sequence[int],
    x_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """3× (lrelu → dilated conv → lrelu → conv) with residual (modules.py:221-309)."""
    for c1, c2, d in zip(params["convs1"], params["convs2"], dilations):
        xt = _lrelu(x)
        if x_mask is not None:
            xt = xt * x_mask
        k = c1["w"].shape[0]
        xt = conv1d(xt, c1["w"], c1["b"], padding=(k * d - d) // 2, dilation=d)
        xt = _lrelu(xt)
        if x_mask is not None:
            xt = xt * x_mask
        k2 = c2["w"].shape[0]
        xt = conv1d(xt, c2["w"], c2["b"], padding=(k2 - 1) // 2)
        x = xt + x
    if x_mask is not None:
        x = x * x_mask
    return x


def apply_resblock2(
    params: dict,
    x: jnp.ndarray,
    dilations: Sequence[int],
    x_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """2× (lrelu → dilated conv) with residual (modules.py:318-356)."""
    for c, d in zip(params["convs"], dilations):
        xt = _lrelu(x)
        if x_mask is not None:
            xt = xt * x_mask
        k = c["w"].shape[0]
        xt = conv1d(xt, c["w"], c["b"], padding=(k * d - d) // 2, dilation=d)
        x = xt + x
    if x_mask is not None:
        x = x * x_mask
    return x


def _stage_plan(params: dict, i: int, u: int, k_up: int, n_stages: int) -> dict | None:
    """The single source of truth for which fused kernel serves stage i.

    Returns {"kind": "tail"|"upmrf"|"mrf", "key": cache key, "fold": r,
    "pad_up": torch padding} or None (XLA fallback).  Both
    pack_generator_caches and apply_generator consult this, so the cache
    keys can never diverge from the kernel dispatch.
    """
    up = params["ups"][i]
    c_in, c_out = up["w"].shape[1], up["w"].shape[2]
    pad_up = (k_up - u) // 2
    is_last = i == n_stages - 1
    fold = 128 // c_out if c_out and 128 % c_out == 0 else 0
    if (
        fold
        and fold % u == 0
        and (fold // u) * c_in == 128
        and k_up - u - 2 * pad_up == 0
    ):
        key = "tail" if is_last else f"upmrf{i}"
        return {"kind": "tail" if is_last else "upmrf", "key": key,
                "fold": fold, "pad_up": pad_up}
    if c_out >= 128 or (c_out and 128 % c_out == 0):
        return {"kind": "mrf", "key": f"mrf{i}",
                "fold": 1 if c_out >= 128 else 128 // c_out, "pad_up": pad_up}
    return None


def pack_generator_caches(
    params: dict,
    *,
    resblock_kind: str,
    resblock_dilation_sizes: Sequence[Sequence[int]],
    upsample_rates: Sequence[int],
    upsample_kernel_sizes: Sequence[int],
    dtype=None,
) -> dict:
    """One-time host-side packing of every fused Pallas stage's weights.

    Returns {"mrf{i}": {"w", "b"}, "tail": {"w", "b"}} for the stages
    apply_generator would fuse; pass the result as its `packed` argument to
    keep the ~200 scatter ops of inline packing out of the serving graph
    (they cost ~0.5 ms per call at V2 shapes).  dtype defaults to bfloat16
    (the serving mode the fused path runs in).
    """
    from openvoice_tpu.ops.mrf_pallas import pack_stage_weights, pack_tail_weights

    dtype = dtype or jnp.bfloat16
    num_kernels = len(resblock_dilation_sizes)
    caches: dict = {}
    if resblock_kind != "1":
        return caches
    n_stages = len(upsample_rates)
    for i, (u, k_up) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
        plan = _stage_plan(params, i, u, k_up, n_stages)
        if plan is None:
            continue
        rbs = [params["resblocks"][i * num_kernels + j] for j in range(num_kernels)]
        kernel_sizes = tuple(rb["convs1"][0]["w"].shape[0] for rb in rbs)
        if plan["kind"] in ("tail", "upmrf"):
            w_all, b_all, _, _, _ = pack_tail_weights(
                params["ups"][i], rbs,
                params["conv_post"]["w"] if plan["kind"] == "tail" else None,
                kernel_sizes, resblock_dilation_sizes, stride=u,
                up_padding=plan["pad_up"], fold=plan["fold"], dtype=dtype, host=True,
            )
        else:
            w_all, b_all, _ = pack_stage_weights(
                rbs, kernel_sizes, resblock_dilation_sizes,
                dtype=dtype, fold=plan["fold"], host=True,
            )
        caches[plan["key"]] = {"w": w_all, "b": b_all}
    return caches


def apply_generator(
    params: dict,
    x: jnp.ndarray,
    *,
    resblock_kind: str,
    resblock_dilation_sizes: Sequence[Sequence[int]],
    upsample_rates: Sequence[int],
    upsample_kernel_sizes: Sequence[int],
    g: jnp.ndarray | None = None,
    x_mask: jnp.ndarray | None = None,
    packed: dict | None = None,
) -> jnp.ndarray:
    """x: [B, T, inter_channels] latent → [B, T·prod(upsample_rates), 1] audio.

    Mirrors Generator.forward (models.py:272-291): conv_pre → optional speaker
    cond add → per stage [lrelu → transposed-conv upsample → MRF mean] →
    lrelu(0.01) → conv_post → tanh.

    `x_mask` ([B, T, 1]) makes bucket-padded decoding *exact*: the reference
    always decodes at the true length, where every conv sees implicit zero
    padding past the boundary; re-zeroing masked positions after each conv
    (conv biases break zero-propagation) reproduces the boundary semantics
    bit-for-bit on padded inputs.
    """
    x = conv1d(x, params["conv_pre"]["w"], params["conv_pre"]["b"], padding=3)
    if g is not None and params.get("cond") is not None:
        x = x + conv1d(g, params["cond"]["w"], params["cond"]["b"])
    if x_mask is not None:
        x = x * x_mask

    resblock_fn = apply_resblock1 if resblock_kind == "1" else apply_resblock2
    num_kernels = len(resblock_dilation_sizes)
    # fused Pallas MRF stage (ops/mrf_pallas.py) for every stage in serving
    # mode: C=128 runs plain tap-matmuls (~114 TF/s on v5e vs ~33 unfused),
    # C<128 stages fold 128//C samples into the lane dim to fill the MXU
    # (7.5× at C=32), C=256 streams branch weights from HBM (stacked stage
    # weights outgrow VMEM)
    use_fused = (
        resblock_kind == "1"
        and x.dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
    )
    n_stages = len(upsample_rates)
    plans = [
        _stage_plan(params, i, u, k, n_stages) if use_fused else None
        for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes))
    ]
    # the fused kernels rebuild masks in-kernel from true lengths, so the
    # true frame count is derived ONCE at frame rate; the audio-rate mask is
    # only materialized while an XLA-fallback stage remains downstream.
    # ([B, T, 1] masks at audio rate are lane-1 arrays — physically padded
    # 128× by TPU tiling, so repeating/summing them at 229k samples costs
    # real HBM traffic for 1 useful byte per 256.)
    cur_len = (
        jnp.sum(x_mask[:, :, 0].astype(jnp.int32), axis=1)
        if x_mask is not None
        else None
    )
    for i, (u, k_up) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
        up = params["ups"][i]
        plan = plans[i]
        # a real mask is only needed past this stage by XLA-fallback stages;
        # every fused kernel re-masks its input from `cur_len` itself
        mask_needed = any(p is None for p in plans[i:])
        is_last = i == n_stages - 1
        pad_up = (k_up - u) // 2
        if plan is not None and plan["kind"] in ("tail", "upmrf"):
            fold = plan["fold"]
            # lrelu → upsample → MRF [→ lrelu(0.01) → conv_post → tanh on the
            # last stage] as one Pallas kernel: the fold_in input layout and
            # the fold_out MRF layout both fill 128 lanes with 1:1 rows
            # (ops/mrf_pallas.py::fused_tail_stage)
            from openvoice_tpu.ops.mrf_pallas import fused_tail_stage, pack_tail_weights

            kernel_sizes = tuple(
                params["resblocks"][i * num_kernels + j]["convs1"][0]["w"].shape[0]
                for j in range(num_kernels)
            )
            post_w = params["conv_post"]["w"] if is_last else None
            key = plan["key"]
            if packed is not None and key in packed:
                from openvoice_tpu.ops.mrf_pallas import (
                    fold_post_taps,
                    fold_transpose_taps,
                    stage_meta,
                )

                w_all = packed[key]["w"].astype(x.dtype)
                b_all = packed[key]["b"].astype(x.dtype)
                up_qs = tuple(fold_transpose_taps(k_up, u, pad_up, fold // u)[0])
                mrf_meta = stage_meta(kernel_sizes, resblock_dilation_sizes, fold)
                post_qs = (
                    tuple(fold_post_taps(post_w.shape[0], fold)[0]) if is_last else None
                )
            else:
                w_all, b_all, up_qs, mrf_meta, post_qs = pack_tail_weights(
                    up,
                    [params["resblocks"][i * num_kernels + j] for j in range(num_kernels)],
                    post_w,
                    kernel_sizes,
                    resblock_dilation_sizes,
                    stride=u,
                    up_padding=pad_up,
                    fold=fold,
                    dtype=x.dtype,
                )
            if cur_len is not None:
                lengths = cur_len * u
            else:
                lengths = jnp.full((x.shape[0],), x.shape[1] * u, jnp.int32)
            out = fused_tail_stage(
                x, lengths, w_all, b_all,
                kernel_sizes=kernel_sizes,
                dilation_sizes=tuple(tuple(d) for d in resblock_dilation_sizes),
                stride=u, fold=fold,
                up_qs=up_qs, mrf_meta=mrf_meta, post_qs=post_qs,
            )
            if is_last:
                return out
            x = out
            if cur_len is not None:
                cur_len = cur_len * u
            if x_mask is not None and mask_needed:
                x_mask = jnp.repeat(x_mask, u, axis=1)
            continue
        x = _lrelu(x)
        x = conv_transpose1d(x, up["w"], up["b"], stride=u, padding=(k_up - u) // 2)
        if cur_len is not None:
            cur_len = cur_len * u
        if x_mask is not None and (mask_needed or plan is None):
            x_mask = jnp.repeat(x_mask, u, axis=1)
            x = x * x_mask
        elif x_mask is not None and plan is not None:
            # skip the audio-rate mask: the fused MRF kernel re-masks its
            # input from `cur_len`, so post-upsample spill past the true
            # length is zeroed in-kernel
            x_mask = None
        if plan is not None and plan["kind"] == "mrf":
            from openvoice_tpu.ops.mrf_pallas import fused_mrf_stage, pack_stage_weights

            fold = plan["fold"]
            kernel_sizes = tuple(
                params["resblocks"][i * num_kernels + j]["convs1"][0]["w"].shape[0]
                for j in range(num_kernels)
            )
            if packed is not None and plan["key"] in packed:
                w_all = packed[plan["key"]]["w"].astype(x.dtype)
                b_all = packed[plan["key"]]["b"].astype(x.dtype)
            else:
                w_all, b_all, _ = pack_stage_weights(
                    [params["resblocks"][i * num_kernels + j] for j in range(num_kernels)],
                    kernel_sizes,
                    resblock_dilation_sizes,
                    dtype=x.dtype,
                    fold=fold,
                )
            if cur_len is not None:
                lengths = cur_len
            else:
                lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
            x = fused_mrf_stage(
                x, lengths, w_all, b_all,
                kernel_sizes=kernel_sizes,
                dilation_sizes=tuple(tuple(d) for d in resblock_dilation_sizes),
                fold=fold,
            )
            continue
        acc = None
        for j in range(num_kernels):
            y = resblock_fn(
                params["resblocks"][i * num_kernels + j], x, resblock_dilation_sizes[j], x_mask
            )
            acc = y if acc is None else acc + y
        x = acc / num_kernels
    # final activation uses torch's default slope 0.01, not LRELU_SLOPE
    # (models.py:287 calls F.leaky_relu with no slope argument)
    x = jax.nn.leaky_relu(x, 0.01)
    x = conv1d(x, params["conv_post"]["w"], None, padding=3)
    return jnp.tanh(x)
