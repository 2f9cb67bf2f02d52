"""One-time converter: torch SynthesizerTrn checkpoints → JAX parameter pytree.

Handles (SURVEY.md §5.4):
* weight-norm folding — checkpoints store ``weight_g``/``weight_v``
  (modules.py:160,172,182; models.py:247,314); plain weights are
  reconstructed as ``g · v/||v||`` with the norm over all dims except
  torch's dim 0.
* layout conversion — torch [out,in,k] conv kernels → [k,in,out] ("HIO");
  ConvTranspose1d kernels are flipped along k at import so the runtime
  transposed conv is a plain lhs-dilated conv (nn/conv.py).
* missing keys are reported, not fatal, matching the reference's
  ``strict=False`` load (api.py:37).

Works on any mapping of numpy arrays; `load_torch_checkpoint` wraps
``torch.load`` for .pth files.
"""

from __future__ import annotations

import numpy as np

from openvoice_tpu.config import SynthesizerConfig


class _SD:
    """State-dict view that records which keys were consumed / missing."""

    def __init__(self, sd: dict):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used: set[str] = set()
        self.missing: list[str] = []

    def get(self, key: str, shape=None):
        if key in self.sd:
            self.used.add(key)
            return self.sd[key].astype(np.float32)
        self.missing.append(key)
        if shape is None:
            return None
        return np.zeros(shape, np.float32)

    def has(self, key: str) -> bool:
        return key in self.sd

    def unexpected(self) -> list[str]:
        return [k for k in self.sd if k not in self.used]


def _fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch._weight_norm(v, g, dim=0): w = g * v / ||v||, norm over dims>0."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return g * v / norm


def _conv_w(sd: _SD, prefix: str) -> np.ndarray:
    """Fetch a conv weight in torch layout, folding weight norm if present."""
    if sd.has(f"{prefix}.weight_v"):
        return _fold_weight_norm(sd.get(f"{prefix}.weight_g"), sd.get(f"{prefix}.weight_v"))
    # torch >= 2.1 parametrized weight norm
    if sd.has(f"{prefix}.parametrizations.weight.original0"):
        return _fold_weight_norm(
            sd.get(f"{prefix}.parametrizations.weight.original0"),
            sd.get(f"{prefix}.parametrizations.weight.original1"),
        )
    w = sd.get(f"{prefix}.weight")
    if w is None:
        raise KeyError(f"missing conv weight for {prefix}")
    return w


def _conv1d(sd: _SD, prefix: str, bias: bool = True) -> dict:
    w = _conv_w(sd, prefix)  # [out, in/groups, k]
    p = {"w": np.transpose(w, (2, 1, 0))}
    if bias:
        b = sd.get(f"{prefix}.bias")
        if b is not None:
            p["b"] = b
        else:
            p["b"] = np.zeros(w.shape[0], np.float32)
    return p


def _convT1d(sd: _SD, prefix: str) -> dict:
    w = _conv_w(sd, prefix)  # [in, out, k]
    w = np.transpose(w, (2, 0, 1))[::-1].copy()  # [k, in, out], k flipped
    return {"w": w, "b": sd.get(f"{prefix}.bias", (w.shape[2],))}


def _conv2d(sd: _SD, prefix: str) -> dict:
    w = _conv_w(sd, prefix)  # [out, in, kh, kw]
    return {
        "w": np.transpose(w, (2, 3, 1, 0)),
        "b": sd.get(f"{prefix}.bias", (w.shape[0],)),
    }


def _linear(sd: _SD, prefix: str) -> dict:
    w = sd.get(f"{prefix}.weight")  # [out, in]
    return {"w": w.T.copy(), "b": sd.get(f"{prefix}.bias", (w.shape[0],))}


def _linear_from_1x1(sd: _SD, prefix: str) -> dict:
    """Conv1d(k=1) used as a linear projection (attention QKV/out)."""
    w = _conv_w(sd, prefix)  # [out, in, 1]
    return {"w": w[:, :, 0].T.copy(), "b": sd.get(f"{prefix}.bias", (w.shape[0],))}


def _ln(sd: _SD, prefix: str, names=("gamma", "beta")) -> dict:
    return {
        "gamma": sd.get(f"{prefix}.{names[0]}"),
        "beta": sd.get(f"{prefix}.{names[1]}"),
    }


def _wn_params(sd: _SD, prefix: str, n_layers: int, gin: int) -> dict:
    p = {"in": [], "res_skip": [], "cond": None}
    for i in range(n_layers):
        p["in"].append(_conv1d(sd, f"{prefix}.in_layers.{i}"))
        p["res_skip"].append(_conv1d(sd, f"{prefix}.res_skip_layers.{i}"))
    if gin and (
        sd.has(f"{prefix}.cond_layer.weight_v")
        or sd.has(f"{prefix}.cond_layer.weight")
        or sd.has(f"{prefix}.cond_layer.parametrizations.weight.original0")
    ):
        p["cond"] = _conv1d(sd, f"{prefix}.cond_layer")
    return p


def _ddsconv(sd: _SD, prefix: str, n_layers: int) -> dict:
    layers = []
    for i in range(n_layers):
        layers.append(
            {
                "sep": _conv1d(sd, f"{prefix}.convs_sep.{i}"),
                "pw": _conv1d(sd, f"{prefix}.convs_1x1.{i}"),
                "norm1": _ln(sd, f"{prefix}.norms_1.{i}"),
                "norm2": _ln(sd, f"{prefix}.norms_2.{i}"),
            }
        )
    return {"layers": layers}


def _conv_flow(sd: _SD, prefix: str) -> dict:
    return {
        "pre": _conv1d(sd, f"{prefix}.pre"),
        "dds": _ddsconv(sd, f"{prefix}.convs", 3),
        "proj": _conv1d(sd, f"{prefix}.proj"),
    }


def _sdp_flows(sd: _SD, prefix: str) -> dict:
    """flows ModuleList layout: [EA, CF, Flip, CF, Flip, CF, Flip, CF, Flip]."""
    ea = {
        "m": sd.get(f"{prefix}.0.m")[:, 0],
        "logs": sd.get(f"{prefix}.0.logs")[:, 0],
    }
    cfs = [_conv_flow(sd, f"{prefix}.{i}") for i in (1, 3, 5, 7)]
    return {"ea": ea, "conv_flows": cfs}


def import_synthesizer(state_dict: dict, cfg: SynthesizerConfig) -> tuple[dict, dict]:
    """torch SynthesizerTrn state_dict → (params pytree, report).

    report = {"missing": [...], "unexpected": [...]} (strict=False semantics).
    """
    sd = _SD(state_dict)
    h = cfg.hidden_channels

    params: dict = {}
    params["enc_q"] = {
        "pre": _conv1d(sd, "enc_q.pre"),
        "wn": _wn_params(sd, "enc_q.enc", cfg.enc_q_layers, cfg.gin_channels),
        "proj": _conv1d(sd, "enc_q.proj"),
    }
    flow_layers = []
    for i in range(cfg.flow_n_flows):
        # even indices are coupling layers; odd are Flip (no params)
        fp = f"flow.flows.{2 * i}"
        flow_layers.append(
            {
                "pre": _conv1d(sd, f"{fp}.pre"),
                "wn": _wn_params(sd, f"{fp}.enc", cfg.flow_wn_layers, cfg.gin_channels),
                "post": _conv1d(sd, f"{fp}.post"),
            }
        )
    params["flow"] = {"layers": flow_layers}

    ups = [_convT1d(sd, f"dec.ups.{i}") for i in range(len(cfg.upsample_rates))]
    resblocks = []
    n_res = len(cfg.upsample_rates) * len(cfg.resblock_kernel_sizes)
    for n in range(n_res):
        if cfg.resblock == "1":
            n_d = len(cfg.resblock_dilation_sizes[n % len(cfg.resblock_kernel_sizes)])
            resblocks.append(
                {
                    "convs1": [_conv1d(sd, f"dec.resblocks.{n}.convs1.{j}") for j in range(n_d)],
                    "convs2": [_conv1d(sd, f"dec.resblocks.{n}.convs2.{j}") for j in range(n_d)],
                }
            )
        else:
            resblocks.append(
                {"convs": [_conv1d(sd, f"dec.resblocks.{n}.convs.{j}") for j in range(2)]}
            )
    params["dec"] = {
        "conv_pre": _conv1d(sd, "dec.conv_pre"),
        "ups": ups,
        "resblocks": resblocks,
        "conv_post": {"w": np.transpose(_conv_w(sd, "dec.conv_post"), (2, 1, 0))},
        "cond": _conv1d(sd, "dec.cond") if sd.has("dec.cond.weight") else None,
    }

    if cfg.n_speakers == 0:
        convs = [_conv2d(sd, f"ref_enc.convs.{i}") for i in range(6)]
        gru = {
            "w_ih": sd.get("ref_enc.gru.weight_ih_l0").T.copy(),
            "w_hh": sd.get("ref_enc.gru.weight_hh_l0").T.copy(),
            "b_ih": sd.get("ref_enc.gru.bias_ih_l0"),
            "b_hh": sd.get("ref_enc.gru.bias_hh_l0"),
        }
        params["ref_enc"] = {
            "layernorm": _ln(sd, "ref_enc.layernorm", names=("weight", "bias"))
            if sd.has("ref_enc.layernorm.weight")
            else None,
            "convs": convs,
            "gru": gru,
            "proj": _linear(sd, "ref_enc.proj"),
        }
    else:
        enc_layers = []
        for i in range(cfg.n_layers):
            ap = f"enc_p.encoder.attn_layers.{i}"
            enc_layers.append(
                {
                    "attn": {
                        "q": _linear_from_1x1(sd, f"{ap}.conv_q"),
                        "k": _linear_from_1x1(sd, f"{ap}.conv_k"),
                        "v": _linear_from_1x1(sd, f"{ap}.conv_v"),
                        "o": _linear_from_1x1(sd, f"{ap}.conv_o"),
                        "emb_rel_k": sd.get(f"{ap}.emb_rel_k")[0],
                        "emb_rel_v": sd.get(f"{ap}.emb_rel_v")[0],
                    },
                    "norm1": _ln(sd, f"enc_p.encoder.norm_layers_1.{i}"),
                    "ffn": {
                        "conv1": _conv1d(sd, f"enc_p.encoder.ffn_layers.{i}.conv_1"),
                        "conv2": _conv1d(sd, f"enc_p.encoder.ffn_layers.{i}.conv_2"),
                    },
                    "norm2": _ln(sd, f"enc_p.encoder.norm_layers_2.{i}"),
                }
            )
        params["enc_p"] = {
            "emb": sd.get("enc_p.emb.weight"),
            "encoder": {"layers": enc_layers},
            "proj": _conv1d(sd, "enc_p.proj"),
        }
        params["sdp"] = {
            "pre": _conv1d(sd, "sdp.pre"),
            "proj": _conv1d(sd, "sdp.proj"),
            "convs": _ddsconv(sd, "sdp.convs", 3),
            "flows": _sdp_flows(sd, "sdp.flows"),
            "post_pre": _conv1d(sd, "sdp.post_pre"),
            "post_proj": _conv1d(sd, "sdp.post_proj"),
            "post_convs": _ddsconv(sd, "sdp.post_convs", 3),
            "post_flows": _sdp_flows(sd, "sdp.post_flows"),
            "cond": _conv1d(sd, "sdp.cond") if sd.has("sdp.cond.weight") else None,
        }
        params["dp"] = {
            "conv1": _conv1d(sd, "dp.conv_1"),
            "norm1": _ln(sd, "dp.norm_1"),
            "conv2": _conv1d(sd, "dp.conv_2"),
            "norm2": _ln(sd, "dp.norm_2"),
            "proj": _conv1d(sd, "dp.proj"),
            "cond": _conv1d(sd, "dp.cond") if sd.has("dp.cond.weight") else None,
        }
        params["emb_g"] = sd.get("emb_g.weight")

    report = {"missing": sd.missing, "unexpected": sd.unexpected()}
    import jax.numpy as jnp
    params = jax_tree_from_numpy(params)
    return params, report


def jax_tree_from_numpy(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: jax_tree_from_numpy(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [jax_tree_from_numpy(v) for v in tree]
    if tree is None:
        return None
    return jnp.asarray(tree)


def load_torch_checkpoint(ckpt_path: str, cfg: SynthesizerConfig) -> tuple[dict, dict]:
    """Load a reference .pth checkpoint (torch.load → checkpoint['model'])."""
    import torch

    checkpoint = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = checkpoint["model"] if "model" in checkpoint else checkpoint
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return import_synthesizer(sd, cfg)


# Native save/load (npz + orbax) lives in ckpt/native_io.py.


def load_params_npz(path: str) -> dict:
    """Rebuild the nested pytree from an .npz produced by save_params_npz."""
    flat = dict(np.load(path))
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = root
        for i, p in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            if p not in node:
                node[p] = {}
            node = node[p]
        node[parts[-1]] = val

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[k]) for k in sorted(keys, key=int)]
            return {k: listify(v) for k, v in node.items()}
        return node

    return jax_tree_from_numpy(listify(root))
