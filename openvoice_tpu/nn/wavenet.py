"""WaveNet residual-gated stack (the hot inner block of enc_q and all
coupling layers; reference: modules.py:133-210).

Design notes (TPU):
* layout [B, T, H]: each dilated conv is an MXU implicit-GEMM over channels;
  the gate is a VPU elementwise fusion XLA folds into the conv epilogue.
* the speaker conditioning is projected once for all layers (one 1x1 conv,
  reference modules.py:156-160) and sliced per layer.
* all per-layer convs share identical shapes (dilation_rate=1 in every shipped
  config), so the stack can also be `lax.scan`-ed; we unroll for maximal
  fusion — 16 layers compile fine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openvoice_tpu.nn.conv import conv1d


def gated_tanh_sigmoid(a: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """fused_add_tanh_sigmoid_multiply equivalent (commons.py:100-107);
    the add happens at the caller so XLA can fuse it with the cond slice."""
    return jnp.tanh(a[..., :hidden]) * jax.nn.sigmoid(a[..., hidden:])


def apply_wn(
    params: dict,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    g: jnp.ndarray | None = None,
    dilation_rate: int = 1,
    stacked: tuple | None = None,
) -> jnp.ndarray:
    """x: [B, T, H], x_mask: [B, T, 1], g: [B, 1, gin] or None → [B, T, H].

    `stacked` (optional) is the pre-packed (w_in, b_in, w_rs, b_rs) tuple
    from ops.wn_pallas.stack_wn_params, built once at model-load time
    (models.synthesizer.make_dec_cache) — it keeps the per-call weight
    stacking copies (~14 MB per convert at V2 size) out of the serving
    graph.  Ignored on the XLA fallback path."""
    hidden = x.shape[-1]
    n_layers = len(params["in"])

    if g is not None and params.get("cond") is not None:
        g_all = conv1d(g, params["cond"]["w"], params["cond"]["b"])  # [B, 1, 2H*L]
    else:
        g_all = None

    # bf16 serving mode: the whole stack as one Pallas kernel with the
    # residual/skip state VMEM-resident (ops/wn_pallas.py); the XLA path
    # below is the f32 parity mode and the fallback for odd shapes
    if (
        x.dtype == jnp.bfloat16
        and dilation_rate == 1
        and jax.default_backend() == "tpu"
        and x.shape[1] % 8 == 0
        and hidden % 8 == 0
    ):
        from openvoice_tpu.ops.wn_pallas import MAX_FUSED_ROWS, fused_wn_stack, stack_wn_params

        kernel_sizes = {p["w"].shape[0] for p in params["in"]}
        if x.shape[1] <= MAX_FUSED_ROWS and len(kernel_sizes) == 1:
            if stacked is not None:
                w_in, b_in, w_rs, b_rs = (a.astype(x.dtype) for a in stacked)
            else:
                w_in, b_in, w_rs, b_rs = stack_wn_params(params, hidden, dtype=x.dtype)
            if g_all is not None:
                g_stack = g_all.reshape(x.shape[0], n_layers, 2 * hidden).astype(x.dtype)
            else:
                g_stack = jnp.zeros((x.shape[0], n_layers, 2 * hidden), x.dtype)
            lengths = jnp.sum(x_mask[:, :, 0].astype(jnp.int32), axis=1)
            return fused_wn_stack(
                x * x_mask, lengths, w_in, b_in, g_stack, w_rs, b_rs,
                kernel_size=kernel_sizes.pop(),
            )

    output = jnp.zeros_like(x)
    for i in range(n_layers):
        lp = params["in"][i]
        k = lp["w"].shape[0]
        dilation = dilation_rate**i
        pad = (k * dilation - dilation) // 2
        x_in = conv1d(x, lp["w"], lp["b"], padding=pad, dilation=dilation)
        if g_all is not None:
            x_in = x_in + g_all[..., i * 2 * hidden : (i + 1) * 2 * hidden]
        acts = gated_tanh_sigmoid(x_in, hidden)
        rs = params["res_skip"][i]
        res_skip = conv1d(acts, rs["w"], rs["b"])
        if i < n_layers - 1:
            x = (x + res_skip[..., :hidden]) * x_mask
            output = output + res_skip[..., hidden:]
        else:
            output = output + res_skip
    return output * x_mask
