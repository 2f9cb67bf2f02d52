"""Pallas TPU kernel: fused WaveNet stack (the inner block of the posterior
encoder and every coupling layer — reference modules.py:133-210).

The XLA path (nn/wavenet.py) issues 2 convs + a gate per layer; at serving
shapes ([T≈896, H=192]) each op is microseconds of MXU work, so the stack is
dominated by inter-op HBM round-trips of the activations.  This kernel keeps
the residual state and the skip accumulator resident in VMEM across ALL
layers and streams only the per-layer weights from HBM (grid over layers —
Pallas double-buffers the weight blocks automatically):

* the dilated conv (dilation 1 in every shipped config, kernel 5) is K
  shifted tap-matmuls `xs[k : k+T] @ W[k]` off a halo-padded VMEM buffer;
* the fused tanh·sigmoid gate (commons.py:100-107) runs on the f32
  accumulator before the res/skip 1×1 matmul;
* speaker conditioning arrives pre-projected as one [B, L, 2H] tensor
  (cond 1×1 conv applied once outside — reference modules.py:156-160) and
  is added as a per-layer bias;
* masking matches apply_wn exactly: (x + res)·mask per layer, skip sums
  masked once at the end.

The last layer's res_skip conv has H (not 2H) outputs in the reference —
the host packs it into the skip half of a [H, 2H] matrix (zero res half),
which keeps every grid step identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# beyond this many rows the f32 temporaries outgrow VMEM; callers fall back
# to the XLA path (nn/wavenet.py decides)
MAX_FUSED_ROWS = 1536


def _wn_kernel(
    len_ref,    # [B] int32 (scalar prefetch): true frame lengths
    x_ref,      # [1, T, H] block: layer-0 input for this batch row
    w_in_ref,   # [1, K, H, 2H] block: this layer's dilated-conv taps
    b_in_ref,   # [1, 2H]
    g_ref,      # [1, 1, 2H]: this (batch, layer)'s conditioning slice
    w_rs_ref,   # [1, H, 2H]: res|skip 1×1 (last layer packed into skip half)
    b_rs_ref,   # [1, 2H]
    out_ref,    # [1, T, H] block (revisited across layers; final write wins)
    xs,         # VMEM [T + 2·pad_ext, H]: residual state + zero halo
    outs,       # VMEM [T, H] f32: skip accumulator
    *,
    tile_t: int,
    k: int,
    n_layers: int,
    pad: int,
):
    b_idx = pl.program_id(0)
    l = pl.program_id(1)
    t = tile_t
    h = x_ref.shape[2]

    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    mask = (row < len_ref[b_idx]).astype(x_ref.dtype)

    # residual state lives at rows [pad, pad+t); rows outside stay zero, so
    # tap kk's slice [kk, kk+t) sees exactly the 'same'-conv zero padding
    @pl.when(l == 0)
    def _():
        xs[:] = jnp.zeros_like(xs)
        xs[pad: pad + t, :] = x_ref[0] * mask
        outs[:] = jnp.zeros_like(outs)

    x_in = jnp.zeros((t, 2 * h), jnp.float32)
    for kk in range(k):
        x_in = x_in + jnp.dot(
            xs[kk: kk + t, :], w_in_ref[0, kk],
            preferred_element_type=jnp.float32,
        )
    x_in = x_in + b_in_ref[0] + g_ref[0, 0]
    acts = (jnp.tanh(x_in[:, :h]) * jax.nn.sigmoid(x_in[:, h:])).astype(xs.dtype)
    rs = jnp.dot(acts, w_rs_ref[0], preferred_element_type=jnp.float32) + b_rs_ref[0]

    @pl.when(l + 1 < n_layers)
    def _():
        xs[pad: pad + t, :] = (xs[pad: pad + t, :] + rs[:, :h].astype(xs.dtype)) * mask

    outs[:] = outs[:] + rs[:, h:]
    out_ref[0] = outs[:].astype(x_ref.dtype) * mask


@partial(jax.jit, static_argnames=("kernel_size", "interpret"))
def fused_wn_stack(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    w_in: jnp.ndarray,
    b_in: jnp.ndarray,
    g_all: jnp.ndarray,
    w_rs: jnp.ndarray,
    b_rs: jnp.ndarray,
    *,
    kernel_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, T, H] (pre-masked); lengths: [B] true frame counts;
    w_in: [L, K, H, 2H]; b_in: [L, 2H]; g_all: [B, L, 2H] conditioning
    (zeros when unconditioned); w_rs: [L, H, 2H] (last layer packed into the
    skip half); b_rs: [L, 2H].  Returns the skip sum [B, T, H]."""
    b, t, h = x.shape
    n_layers = w_in.shape[0]
    pad = (kernel_size - 1) // 2
    # buffer slack: ≥ 2·pad extra rows (tail rows beyond pad+t stay zero)
    pad_ext = -(-pad // 4) * 4

    # singleton sublane dims keep per-layer bias/cond blocks legal (Mosaic
    # wants the last two block dims divisible by (8, 128) or equal to the
    # array's)
    b_in = b_in.reshape(n_layers, 1, 2 * h)
    b_rs = b_rs.reshape(n_layers, 1, 2 * h)
    g_all = g_all.reshape(b, n_layers, 1, 2 * h)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_layers),
        in_specs=[
            pl.BlockSpec((1, t, h), lambda i, l, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + w_in.shape[1:], lambda i, l, s: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * h), lambda i, l, s: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2 * h), lambda i, l, s: (i, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 2 * h), lambda i, l, s: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * h), lambda i, l, s: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, h), lambda i, l, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((t + 2 * pad_ext, h), x.dtype),
            pltpu.VMEM((t, h), jnp.float32),
        ],
    )
    return pl.pallas_call(
        partial(
            _wn_kernel,
            tile_t=t,
            k=kernel_size,
            n_layers=n_layers,
            pad=pad,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lengths.astype(jnp.int32), x, w_in, b_in, g_all, w_rs, b_rs)


def stack_wn_params(params: dict, hidden: int, dtype=None):
    """Stack per-layer WN param lists into the fused kernel's tensors
    (in-graph; XLA folds the concatenations).  Returns
    (w_in [L,K,H,2H], b_in [L,2H], w_rs [L,H,2H], b_rs [L,2H])."""
    n_layers = len(params["in"])
    w_in = jnp.stack([params["in"][i]["w"] for i in range(n_layers)])
    b_in = jnp.stack([params["in"][i]["b"] for i in range(n_layers)])
    rs_w, rs_b = [], []
    for i in range(n_layers):
        w = params["res_skip"][i]["w"][0]  # [H, out]
        bb = params["res_skip"][i]["b"]
        if w.shape[1] == hidden:  # last layer: skip-only → pack into skip half
            w = jnp.concatenate([jnp.zeros_like(w), w], axis=1)
            bb = jnp.concatenate([jnp.zeros_like(bb), bb])
        rs_w.append(w)
        rs_b.append(bb)
    w_rs = jnp.stack(rs_w)
    b_rs = jnp.stack(rs_b)
    if dtype is not None:
        w_in, b_in, w_rs, b_rs = (a.astype(dtype) for a in (w_in, b_in, w_rs, b_rs))
    return w_in, b_in, w_rs, b_rs
