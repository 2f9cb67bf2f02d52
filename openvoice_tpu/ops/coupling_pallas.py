"""Pallas TPU kernel: fused residual-coupling BLOCK (the converter's flow).

The reference flow (models.py:367-397) is 4× [ResidualCouplingLayer + Flip];
each coupling is pre-1×1 → WN(4 layers) → post-1×1 → affine update of one
channel half (modules.py:402-456, mean_only=True).  The unfused serving path
costs 8 pallas launches (per-coupling WN stacks) plus ~40 small XLA ops
(96-lane pre/post convs, channel flips, half splits) per direction — at
[T≈896, C=192] that overhead dominates the actual matmul work (measured
367 µs for fwd+rev vs ≈150 µs of MXU time).

This kernel runs one whole direction (forward or reverse) in ONE launch:

* grid = (batch, 4 coupling steps); the [T, C] state lives in VMEM scratch
  across steps; per-step weights arrive as blocks (Pallas double-buffers
  them automatically);
* the channel `Flip` between couplings is absorbed into the packed pre/post
  matrices: coupling s sees the state through `parity(s)` flips, so its pre
  matrix reads the correct (possibly reversed) half directly from the
  unflipped physical state, and its post matrix scatters the update into
  the correct physical lanes — no data movement at all;
* `reverse` negates the packed post matrix (x1 − m vs x1 + m), so the
  kernel body is direction-agnostic;
* masking matches the XLA path exactly: h and the state update are masked
  per step, and the state is initialized as x·mask.

Weight layout is produced by `pack_coupling_block` (host-side numpy — one
time at model load, cached in make_dec_cache under "coupling").
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# beyond this many rows the state + per-step temporaries outgrow VMEM;
# callers fall back to the per-coupling path
MAX_FUSED_ROWS = 1024


def _exec_order(n_layers: int, reverse: bool):
    """(coupling index, flip parity of the state seen by that coupling) in
    execution order.  Forward: coupling c executes after c flips.  Reverse
    (flip⁻¹ then coupling⁻¹, chain backwards): step s undoes coupling
    n-1-s and sees the state through s+1 flips."""
    if not reverse:
        return [(s, s % 2) for s in range(n_layers)]
    return [(n_layers - 1 - s, (s + 1) % 2) for s in range(n_layers)]


def pack_coupling_block(flow_params: dict, hidden: int, *, reverse: bool,
                        dtype=jnp.bfloat16, kernel_size: int | None = None):
    """Pack one direction of the coupling block for the fused kernel.

    flow_params: {"layers": [{"pre", "wn", "post"}, ...]} (mean_only
    couplings, uniform WN kernel size).  Returns a dict of stacked arrays,
    all indexed by EXECUTION step:

      wp    [S, C, C]   pre 1×1 lifted to physical lanes (flip-absorbed)
      bp    [S, 1, H]   pre bias
      w_in  [S, L, K, H, 2H]  WN dilated-conv taps
      b_in  [S, L, 1, 2H]
      w_rs  [S, L, H, 2H]     WN res|skip (last layer packed into skip half)
      b_rs  [S, L, 1, 2H]
      wq    [S, H, C]   post 1×1 scattered to physical target lanes,
                        negated for the reverse direction
      bq    [S, 1, C]   post bias, same placement/sign

    C = 2·half (the flow channel count), H = hidden.

    kernel_size, when given (the cfg.flow_kernel_size the caller will pass
    to fused_coupling_block), is checked against the actual WN tap count so
    a checkpoint/config mismatch fails loudly here instead of producing
    silently wrong audio.  The packing also asserts each coupling is
    mean_only (post width == half) — the kernel's algebra assumes it.
    """
    from openvoice_tpu.ops.wn_pallas import stack_wn_params

    layers = flow_params["layers"]
    n = len(layers)
    half = np.asarray(layers[0]["pre"]["w"]).shape[1]
    c = 2 * half
    get = lambda a: np.asarray(jax.device_get(a), np.float32)

    wp, bp, wq, bq = [], [], [], []
    w_in, b_in, w_rs, b_rs = [], [], [], []
    for cpl, parity in _exec_order(n, reverse):
        lp = layers[cpl]
        pre_w = get(lp["pre"]["w"])[0]  # [half, H]
        post_w = get(lp["post"]["w"])[0]  # [H, half]
        post_b = get(lp["post"]["b"])  # [half]
        if post_w.shape[1] != half:
            raise ValueError(
                f"fused coupling requires mean_only couplings: post width "
                f"{post_w.shape[1]} != half {half} (coupling {cpl})"
            )
        k_actual = np.asarray(lp["wn"]["in"][0]["w"]).shape[0]
        if kernel_size is not None and k_actual != kernel_size:
            raise ValueError(
                f"flow WN kernel size mismatch: weights have k={k_actual}, "
                f"config says {kernel_size} (coupling {cpl})"
            )

        m_pre = np.zeros((c, hidden), np.float32)
        m_post = np.zeros((hidden, c), np.float32)
        v_post = np.zeros((c,), np.float32)
        if parity == 0:
            # x0 = lanes [0, half); update target = lanes [half, c)
            m_pre[:half] = pre_w
            m_post[:, half:] = post_w
            v_post[half:] = post_b
        else:
            # state is seen through one flip: x0[j] = x[c-1-j] i.e. the
            # reversed upper half; the update lands reversed in the lower half
            m_pre[c - 1 - np.arange(half)] = pre_w
            m_post[:, half - 1 - np.arange(half)] = post_w
            v_post[half - 1 - np.arange(half)] = post_b
        if reverse:
            m_post, v_post = -m_post, -v_post
        wp.append(m_pre)
        bp.append(get(lp["pre"]["b"])[None])
        wq.append(m_post)
        bq.append(v_post[None])

        wi, bi, wr, br = stack_wn_params(lp["wn"], hidden)
        w_in.append(np.asarray(jax.device_get(wi), np.float32))
        b_in.append(np.asarray(jax.device_get(bi), np.float32)[:, None, :])
        w_rs.append(np.asarray(jax.device_get(wr), np.float32))
        b_rs.append(np.asarray(jax.device_get(br), np.float32)[:, None, :])

    cast = lambda a: jnp.asarray(np.stack(a), dtype)
    return {
        "wp": cast(wp), "bp": cast(bp), "wq": cast(wq), "bq": cast(bq),
        "w_in": cast(w_in), "b_in": cast(b_in),
        "w_rs": cast(w_rs), "b_rs": cast(b_rs),
    }


def _coupling_kernel(
    len_ref,     # [B] int32 (scalar prefetch)
    x_ref,       # [1, T, C] block: flow input for this batch row
    wp_ref,      # [1, C, H]
    bp_ref,      # [1, 1, H]
    w_in_ref,    # [1, L, K, H, 2H]
    b_in_ref,    # [1, L, 1, 2H]
    g_ref,       # [1, 1, L, 1, 2H]: this (batch, step)'s conditioning
    w_rs_ref,    # [1, L, H, 2H]
    b_rs_ref,    # [1, L, 1, 2H]
    wq_ref,      # [1, H, C]
    bq_ref,      # [1, 1, C]
    out_ref,     # [1, T, C] block (revisited; final step's write wins)
    xstate,      # VMEM [T, C]: physical (unflipped) flow state
    hs,          # VMEM [T + 2·pad_ext, H]: WN residual state + zero halo
    *,
    tile_t: int,
    k: int,
    n_wn_layers: int,
    n_steps: int,
    pad: int,
):
    b_idx = pl.program_id(0)
    s = pl.program_id(1)
    t = tile_t
    h = wp_ref.shape[2]

    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    mask = (row < len_ref[b_idx]).astype(xstate.dtype)

    @pl.when(s == 0)
    def _():
        xstate[:] = x_ref[0] * mask
        hs[:] = jnp.zeros_like(hs)

    # pre 1×1 (flip/half-select absorbed): h = x0 @ W_pre + b
    hval = jnp.dot(xstate[:], wp_ref[0], preferred_element_type=jnp.float32)
    hval = (hval + bp_ref[0]).astype(xstate.dtype) * mask
    hs[pad: pad + t, :] = hval

    skip = jnp.zeros((t, h), jnp.float32)
    for l in range(n_wn_layers):
        x_in = jnp.zeros((t, 2 * h), jnp.float32)
        for kk in range(k):
            x_in = x_in + jnp.dot(
                hs[kk: kk + t, :], w_in_ref[0, l, kk],
                preferred_element_type=jnp.float32,
            )
        x_in = x_in + b_in_ref[0, l] + g_ref[0, 0, l, 0]
        acts = (jnp.tanh(x_in[:, :h]) * jax.nn.sigmoid(x_in[:, h:])).astype(hs.dtype)
        rs = jnp.dot(acts, w_rs_ref[0, l], preferred_element_type=jnp.float32)
        rs = rs + b_rs_ref[0, l]
        if l + 1 < n_wn_layers:
            hs[pad: pad + t, :] = (hs[pad: pad + t, :] + rs[:, :h].astype(hs.dtype)) * mask
        skip = skip + rs[:, h:]

    out_wn = skip.astype(xstate.dtype) * mask
    # post 1×1 scattered into the physical target half (sign pre-applied)
    m_placed = jnp.dot(out_wn, wq_ref[0], preferred_element_type=jnp.float32)
    m_placed = m_placed + bq_ref[0]
    xstate[:] = ((xstate[:] + m_placed.astype(xstate.dtype)) * mask)

    @pl.when(s == n_steps - 1)
    def _():
        out_ref[0] = xstate[:]


@partial(jax.jit, static_argnames=("kernel_size", "interpret"))
def fused_coupling_block(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    packed: dict,
    g_all: jnp.ndarray,
    *,
    kernel_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, T, C] flow input; lengths: [B] true frame counts; packed:
    pack_coupling_block output (one direction); g_all: [B, S, L, 2H]
    per-step per-layer conditioning (cond 1×1 conv applied outside, in
    EXECUTION order).  Returns [B, T, C]."""
    b, t, c = x.shape
    s_steps, n_layers = packed["w_in"].shape[0], packed["w_in"].shape[1]
    h = packed["wp"].shape[2]
    pad = (kernel_size - 1) // 2
    pad_ext = -(-pad // 4) * 4

    g_all = g_all.reshape(b, s_steps, n_layers, 1, 2 * h).astype(x.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, s_steps),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, s, l: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h), lambda i, s, l: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda i, s, l: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + packed["w_in"].shape[1:], lambda i, s, l: (s, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + packed["b_in"].shape[1:], lambda i, s, l: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + g_all.shape[2:], lambda i, s, l: (i, s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + packed["w_rs"].shape[1:], lambda i, s, l: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + packed["b_rs"].shape[1:], lambda i, s, l: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, c), lambda i, s, l: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, s, l: (s, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, c), lambda i, s, l: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((t, c), x.dtype),
            pltpu.VMEM((t + 2 * pad_ext, h), x.dtype),
        ],
    )
    return pl.pallas_call(
        partial(
            _coupling_kernel,
            tile_t=t,
            k=kernel_size,
            n_wn_layers=n_layers,
            n_steps=s_steps,
            pad=pad,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        lengths.astype(jnp.int32), x,
        packed["wp"], packed["bp"], packed["w_in"], packed["b_in"], g_all,
        packed["w_rs"], packed["b_rs"], packed["wq"], packed["bq"],
    )


def coupling_g_stack(flow_params: dict, g: jnp.ndarray, *, reverse: bool,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """Apply each coupling's cond 1×1 conv to g ([B, 1, gin]) and stack the
    results in execution order → [B, S, L, 2H] for fused_coupling_block."""
    from openvoice_tpu.nn.conv import conv1d

    layers = flow_params["layers"]
    stacked = []
    for cpl, _parity in _exec_order(len(layers), reverse):
        wn = layers[cpl]["wn"]
        ga = conv1d(g, wn["cond"]["w"], wn["cond"]["b"])  # [B, 1, L·2H]
        n_l = len(wn["in"])
        stacked.append(ga.reshape(ga.shape[0], n_l, -1))  # [B, L, 2H]
    return jnp.stack(stacked, axis=1).astype(dtype)  # [B, S, L, 2H]
