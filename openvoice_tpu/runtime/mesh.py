"""Device mesh + sharding runtime (SURVEY.md §2.3 — new, no reference
counterpart; the reference is single-process single-device).

Axes:
* ``data``  — batch (DP): utterances sharded across hosts/chips; gradients
  all-reduce over ICI/DCN via XLA collectives inserted by GSPMD.
* ``model`` — model parallel (TP): wide HiFi-GAN conv channels and WN hidden
  channels sharded; activations locally sharded on the channel (lane) axis.

Everything goes through `jax.jit` + `NamedSharding` — no hand-written
collectives on the forward path; XLA chooses psum/all-gather placements.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None, model: int | None = None) -> Mesh:
    """Build a ("data", "model") mesh.  Defaults: all devices on data.

    If the default platform has fewer than n_devices, falls back to the CPU
    backend (virtual devices via --xla_force_host_platform_device_count) so
    sharding dry-runs work on a single-chip or chipless host.
    """
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_devices:
                devices = cpu
        except RuntimeError:
            pass
    n = n_devices or len(devices)
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    devices = devices[:n]
    if data is None and model is None:
        data, model = n, 1
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def make_hybrid_mesh(devices=None, model: int = 1) -> Mesh:
    """DCN-aware ("data", "model") mesh for multi-host slices.

    Model-axis groups are confined to one host's devices so TP collectives
    ride ICI; the data axis's outer stride crosses hosts so only DP traffic
    (batch dispatch, gradient psum) touches DCN — the layout recipe of
    SURVEY.md §2.3/§5.8.  Host membership comes from ``device.process_index``
    (0 for all devices in a single-process run, which degrades to make_mesh).
    """
    devices = list(devices if devices is not None else jax.devices())
    by_host: dict[int, list] = {}
    for d in devices:
        by_host.setdefault(getattr(d, "process_index", 0), []).append(d)
    hosts = [by_host[k] for k in sorted(by_host)]
    per_host = len(hosts[0])
    if any(len(h) != per_host for h in hosts):
        raise ValueError("hosts expose unequal device counts")
    if per_host % model != 0:
        raise ValueError(
            f"model={model} does not fit within one host's {per_host} devices; "
            "a model group crossing hosts would put TP collectives on DCN"
        )
    rows = []
    for h in hosts:
        for i in range(per_host // model):
            rows.append(h[i * model : (i + 1) * model])
    arr = np.empty((len(rows), model), dtype=object)
    for i, r in enumerate(rows):
        for j, d in enumerate(r):
            arr[i, j] = d
    return Mesh(arr, ("data", "model"))


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------

# path-regex → PartitionSpec for the weight's last axis (output channels).
# Only genuinely wide tensors are sharded; small ones stay replicated.
_PARAM_RULES: list[tuple[str, P]] = [
    # HiFi-GAN: conv_pre + cond project into upsample_initial_channel (512)
    (r"dec\.conv_pre\.w$", P(None, None, "model")),
    (r"dec\.cond\.w$", P(None, None, "model")),
    # upsample kernels [k, cin, cout]: shard input channels to match the
    # incoming activation sharding, gather on output
    (r"dec\.ups\.\d+\.w$", P(None, "model", None)),
    # WN stacks: in_layers expand h → 2h; shard the 2h axis
    (r"(enc_q|flow)\..*in\.\d+\.w$", P(None, None, "model")),
    (r"(enc_q|flow)\..*cond\.w$", P(None, None, "model")),
]


def param_spec(path: str, leaf: Any) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.search(pattern, path):
            return spec
    return P()  # replicated


def params_shardings(params: Any, mesh: Mesh, prefix: str = "") -> Any:
    """NamedSharding pytree (same structure as `params`) per the rules."""
    if isinstance(params, dict):
        return {
            k: params_shardings(v, mesh, f"{prefix}.{k}" if prefix else k)
            for k, v in params.items()
        }
    if isinstance(params, (list, tuple)):
        out = [params_shardings(v, mesh, f"{prefix}.{i}") for i, v in enumerate(params)]
        return out if isinstance(params, list) else tuple(out)
    if params is None:
        return None
    spec = param_spec(prefix, params)
    # never shard an axis that doesn't divide evenly
    if any(
        name is not None
        and params.shape[axis] % mesh.shape[name] != 0
        for axis, name in enumerate(spec)
        if axis < params.ndim
    ):
        spec = P()
    return NamedSharding(mesh, spec)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Utterance batches shard over the data axis (leading dim)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree onto the mesh per the rules."""
    shardings = params_shardings(params, mesh)

    def place(p, s):
        if isinstance(p, dict):
            return {k: place(p[k], s[k]) for k in p}
        if isinstance(p, (list, tuple)):
            return [place(a, b) for a, b in zip(p, s)]
        if p is None:
            return None
        return jax.device_put(p, s)

    return place(params, shardings)
