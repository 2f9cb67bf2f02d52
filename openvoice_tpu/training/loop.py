"""Training loop driver: data pipeline → (GAN) train step → orbax
checkpoints, with resume and multi-host batch assembly.

Single-host: `train(root, cfg, steps=...)`.  Multi-host: call
`runtime.multihost.initialize()` first; each process feeds its own data
shard and only process 0 writes checkpoints.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.training import train as T
from openvoice_tpu.training.data import ConverterDataset, make_global_batch


def train(
    data_root: str,
    cfg: SynthesizerConfig,
    *,
    steps: int = 1000,
    batch_size: int = 8,
    segment_frames: int = 128,
    lr: float = 2e-4,
    adversarial: bool = True,
    ckpt_dir: str | None = None,
    ckpt_every: int = 500,
    mesh=None,
    log_every: int = 50,
    seed: int = 0,
    on_step=None,
) -> T.GanTrainState | T.TrainState:
    """Run `steps` optimizer steps; returns the final state.

    adversarial=True uses the full GAN recipe (gan_train_step);
    False runs the mel+KL-only warmup objective (train_step).
    on_step(step, metrics), if given, fires after each step's checkpoint
    gate — progress callbacks, elastic fault injection (runtime/elastic.py
    ::train_worker_main), early-stop signals via exception.
    """
    ds = ConverterDataset(data_root, cfg, batch_size, segment_frames, seed=seed)
    if len(ds.segments) < batch_size:
        raise ValueError(
            f"dataset yields {len(ds.segments)} segments < batch_size "
            f"{batch_size}: no full batch can form (shorten segment_frames, "
            "lower batch_size, or add data)"
        )

    key = jax.random.PRNGKey(seed)
    if adversarial:
        state = T.init_gan_train_state(jax.random.PRNGKey(seed), cfg, lr)
    else:
        state = T.init_train_state(jax.random.PRNGKey(seed), cfg, lr)

    start_step = 0
    if ckpt_dir is not None:
        from openvoice_tpu.ckpt import native_io as CIO

        latest = CIO.latest_step(ckpt_dir)
        if latest is not None:
            state = CIO.load_checkpoint(f"{ckpt_dir}/step_{latest}", template=state)
            start_step = latest

    from openvoice_tpu.training.data import PrefetchIterator

    step = start_step
    t0 = time.time()
    while step < steps:
        epoch_start = step
        # host batch prep overlaps the device step (data.py::PrefetchIterator);
        # the with-block stops the worker thread on early exit
        with PrefetchIterator(iter(ds)) as prefetch:
            for spec, audio, lengths, g in prefetch:
                if step >= steps:
                    break
                if mesh is not None:
                    spec = make_global_batch(spec, mesh)
                    audio = make_global_batch(audio, mesh)
                    lengths = make_global_batch(lengths, mesh)
                    g = make_global_batch(g, mesh)
                else:
                    spec, audio = jnp.asarray(spec), jnp.asarray(audio)
                    lengths, g = jnp.asarray(lengths), jnp.asarray(g)
                key, sub = jax.random.split(key)
                if adversarial:
                    state, metrics = T.gan_train_step(
                        state, cfg, spec, audio, lengths, g, sub,
                        segment_frames=min(32, segment_frames), lr=lr,
                    )
                else:
                    state, metrics = T.train_step(
                        state, cfg, spec, audio, lengths, g, sub,
                        segment_frames=min(32, segment_frames), lr=lr,
                    )
                step += 1
                if log_every and step % log_every == 0 and jax.process_index() == 0:
                    ms = {k: round(float(v), 4) for k, v in metrics.items()}
                    print(f"[train] step {step}/{steps} ({(time.time()-t0):.1f}s) {ms}", flush=True)
                if ckpt_dir is not None and step % ckpt_every == 0 and jax.process_index() == 0:
                    from openvoice_tpu.ckpt import native_io as CIO

                    CIO.save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state), step=step)
                if on_step is not None:
                    on_step(step, metrics)
        if step == epoch_start:
            # a one-shot/exhausted iterable yields nothing: stop instead of
            # spinning forever re-wrapping an empty iterator
            print(f"[train] dataset exhausted at step {step}/{steps}; stopping",
                  flush=True)
            break
    if ckpt_dir is not None and jax.process_index() == 0 and step != start_step:
        from openvoice_tpu.ckpt import native_io as CIO

        CIO.save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state), step=step)
    return state
