"""Native checkpoint save/load (SURVEY.md §5.4).

The reference only *loads* torch checkpoints (api.py:35-39); training and
serving here need a native round-trippable format.  Two tiers:

* **Orbax** (`save_checkpoint`/`load_checkpoint`/`Checkpointer`): the
  multi-host path — async-capable, handles sharded arrays (each host writes
  its shards), step management for train resume.
* **npz** (`save_npz`/`load_npz`): dependency-light single-file format for
  SE vectors and small exports; flat dotted-path keys.

The torch→native conversion tool is `ckpt/torch_import.py` (weight-norm
folding); `convert_torch_checkpoint()` here glues the two: .pth in, orbax
dir out, so serving never touches torch at runtime.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

import jax


# ---------------------------------------------------------------------------
# Flat npz tier
# ---------------------------------------------------------------------------

def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}.{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}.{i}"))
    elif tree is None:
        pass
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> Any:
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            # sort numerically and tolerate gaps (a None leaf inside a list
            # is skipped by _flatten, leaving e.g. keys {0, 2})
            return [listify(node[k]) for k in sorted(keys, key=int)]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_npz(path: str, tree: Any) -> None:
    flat = _flatten(jax.tree.map(np.asarray, tree))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_npz(path: str) -> Any:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


# ---------------------------------------------------------------------------
# Orbax tier
# ---------------------------------------------------------------------------

def save_checkpoint(directory: str, tree: Any, step: int | None = None) -> str:
    """Write an orbax checkpoint; returns the written path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return path


def load_checkpoint(directory: str, template: Any | None = None) -> Any:
    """Read an orbax checkpoint.  `template` (a pytree of arrays or
    ShapeDtypeStructs, e.g. from init_synthesizer) restores with matching
    structure/shardings; without it the raw pytree is returned."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            template = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "shape")
                else x,
                template,
            )
            return ckptr.restore(path, template)
        return ckptr.restore(path)


def latest_step(directory: str) -> int | None:
    """Highest step_N subdirectory, for train resume."""
    if not os.path.isdir(directory):
        return None
    steps = [
        int(name[5:])
        for name in os.listdir(directory)
        if name.startswith("step_") and name[5:].isdigit()
    ]
    return max(steps) if steps else None


def convert_torch_checkpoint(pth_path: str, out_dir: str, cfg) -> str:
    """One-time tool: torch .pth → orbax dir (weight-norm folded)."""
    from openvoice_tpu.ckpt.torch_import import load_torch_checkpoint

    params, report = load_torch_checkpoint(pth_path, cfg)
    path = save_checkpoint(out_dir, params)
    if report.get("unexpected"):
        print(f"[convert] {len(report['unexpected'])} unexpected keys ignored")
    return path
