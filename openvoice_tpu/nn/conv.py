"""Convolution primitives in TPU-friendly [B, T, C] layout.

Semantics match torch's Conv1d / ConvTranspose1d / Conv2d so imported
checkpoints reproduce the reference numerics, but the layout is
channels-last: time on sublanes, channels on lanes, which is what XLA:TPU
tiles best.  Kernels are stored [K, C_in, C_out] ("HIO").

Transposed conv is expressed as input-dilated regular conv (lhs_dilation),
which XLA lowers to an MXU-tiled implicit-GEMM — no scatter, no host loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIMS_1D = ("NHC", "HIO", "NHC")
_DIMS_2D = ("NHWC", "HWIO", "NHWC")

# Full-f32 matmul passes by default: measured on TPU v5e the convert graph is
# latency-bound at serving shapes, so "highest" costs nothing over bf16
# (0.42 ms vs 0.38 ms per 10 s utterance) and guarantees checkpoint parity.
# Pass precision=None to inherit `jax_default_matmul_precision` instead.
_PREC = lax.Precision.HIGHEST


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    precision=_PREC,
) -> jnp.ndarray:
    """x: [B, T, Cin], w: [K, Cin/groups, Cout] → [B, T', Cout]."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMS_1D,
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def _transpose_phase_groups(k: int, u: int, pad: int):
    """Static phase decomposition of a transposed conv (flipped-weight
    formulation): out[t·u + p] = Σ over (δ, pairs): Σ_{(p,j)∈pairs}
    x[t + δ] @ w[j].  Returns {δ: [(p, j), ...]}."""
    groups: dict[int, list[tuple[int, int]]] = {}
    for p in range(u):
        for j in range(k):
            num = p - pad + j
            if num % u == 0:
                groups.setdefault(num // u, []).append((p, j))
    return groups


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int,
    padding: int = 0,
    precision=_PREC,
) -> jnp.ndarray:
    """Torch-semantics ConvTranspose1d.

    x: [B, T, Cin]; w is stored pre-converted as [K, Cin, Cout] with the
    kernel axis already flipped (see ckpt/torch_import.py), so here it is a
    plain conv over the stride-dilated input:
    out[t] = sum_k x_dilated[t + k - (K-1-p)] · w[k].
    Output length = (T-1)·stride + K - 2·padding (torch formula).

    Fast path (k ≤ 2u, the shipped HiFi-GAN configs): decompose by output
    phase into ≤3 matmuls [T, Cin] @ [Cin, u·Cout] over statically shifted
    inputs — XLA's lhs-dilated conv lowering leaves most of the MXU idle at
    audio-rate shapes (measured ~1.5 ms/stage of pure overhead on v5e),
    while the phase matmuls are ordinary GEMMs.
    """
    k = w.shape[0]
    u = stride
    pad = k - 1 - padding
    # fast path needs out_len == T·u (true for the k=2u, pad=(k-u)/2 configs)
    fast_ok = u > 1 and (k - u - 2 * padding) == 0 and u * w.shape[2] <= 4096
    groups = _transpose_phase_groups(k, u, pad) if fast_ok else None
    if groups is not None and len(groups) <= 4:
        bsz, t, cin = x.shape
        cout = w.shape[2]
        deltas = sorted(groups)
        dmax = max(abs(d) for d in deltas)
        xp = jnp.pad(x, ((0, 0), (dmax, dmax), (0, 0)))
        y = None
        for d in deltas:
            # [Cin, u·Cout] phase-blocked weight; unfilled phases stay zero
            wd = jnp.zeros((cin, u * cout), w.dtype)
            for p, j in groups[d]:
                wd = wd.at[:, p * cout:(p + 1) * cout].set(w[j])
            xd = lax.dynamic_slice_in_dim(xp, dmax + d, t, axis=1)
            yd = jnp.dot(xd, wd, precision=precision, preferred_element_type=jnp.float32)
            y = yd if y is None else y + yd
        y = y.astype(x.dtype).reshape(bsz, t * u, cout)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMS_1D,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: tuple[int, int] = (1, 1),
    padding: tuple[int, int] = (0, 0),
    precision=_PREC,
) -> jnp.ndarray:
    """x: [B, H, W, Cin], w: [KH, KW, Cin, Cout] → [B, H', W', Cout]."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=_DIMS_2D,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None, precision=_PREC) -> jnp.ndarray:
    """x: [..., Cin], w: [Cin, Cout]."""
    y = jnp.dot(x, w, precision=precision, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def layer_norm(
    x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm over the last (channel) axis — the reference's channel-first
    LayerNorm (modules.py:17-29) becomes a plain last-axis norm in [B,T,C]."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * gamma + beta
