"""Elastic recovery: detect a dead host, re-initialize a shrunk world, and
re-run the in-flight work (SURVEY.md §5.3 "detects dead hosts via collective
timeout and restarts the batch").

The reference has nothing here — failures surface as exceptions and the app
catches one step (/root/reference/openvoice/openvoice_app.py:117-128).  This
module supplies the multi-host story the reference never had.

Why recovery is relaunch-based, not in-process
----------------------------------------------
When a peer process dies, XLA's coordination service *terminates the
survivors by design*: the client's error-polling thread hits
``LOG(FATAL) Terminating process because the JAX distributed service
detected fatal errors`` (client.h:80) as soon as peer heartbeats lapse —
measured here on jax 0.9 both with and without calling
``jax.distributed.shutdown()``.  There is no public knob to opt out, and
this matches TPU-pod operational reality (a sliced-out host invalidates the
whole ICI/DCN program; the runtime wants the job restarted).  Elastic
behavior therefore lives one level up, exactly where torchrun-elastic and
Borg/Pathways put it:

- work is persisted in a WorkLog (requests up front, each result atomically
  as it completes), so nothing is lost with a process;
- workers heartbeat between collective rounds (runtime/multihost.py::
  HeartbeatMonitor); on ``beat() == False`` a survivor exits voluntarily
  with EX_TEMPFAIL rather than waiting for the XLA fatal;
- the Supervisor relaunches a SHRUNK world (world − dead hosts, minimum 1)
  with a fresh coordinator; relaunched workers reload params from the
  WorkLog dir and re-run only the still-pending requests.

The end state is the SURVEY sentence made true: the dead host is detected
via collective timeout, the surviving host(s) re-initialize, reload params,
and the in-flight batch is restarted and completed with correct outputs
(tests/test_elastic.py kills a worker with SIGKILL mid-stream and checks
every request's audio against single-process truth).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time

import numpy as np

EX_TEMPFAIL = 75  # voluntary survivor exit: "peer lost, relaunch me"


# ---------------------------------------------------------------------------
# Work log: the persistent request/result state that survives processes
# ---------------------------------------------------------------------------

class WorkLog:
    """Directory-backed request/result log.

    Layout: ``requests.npz`` (the full batch, written once up front),
    ``params.npz`` (model weights for worker reload), ``done/<id>.npy``
    (one result per completed request, written atomically via
    tmp-then-rename so a killed writer never leaves a half result).
    """

    def __init__(self, state_dir: str):
        self.dir = state_dir
        os.makedirs(os.path.join(state_dir, "done"), exist_ok=True)

    # -- requests --------------------------------------------------------

    def write_requests(self, requests: list[dict]) -> None:
        """Each request: dict with spec [T,F], n_frames, g_src, g_tgt, tau,
        seed.  Request id = position in this list."""
        flat = {}
        for i, r in enumerate(requests):
            for k, v in r.items():
                flat[f"{i}/{k}"] = np.asarray(v)
        flat["n_requests"] = np.asarray(len(requests))
        np.savez(os.path.join(self.dir, "requests.npz"), **flat)

    def load_requests(self) -> list[dict]:
        with np.load(os.path.join(self.dir, "requests.npz")) as z:
            n = int(z["n_requests"])
            out = []
            for i in range(n):
                out.append({
                    k.split("/", 1)[1]: z[k]
                    for k in z.files if k.startswith(f"{i}/")
                })
        return out

    # -- params ----------------------------------------------------------

    def write_params(self, params) -> None:
        from openvoice_tpu.ckpt.native_io import save_npz

        save_npz(os.path.join(self.dir, "params.npz"), params)

    def load_params(self):
        from openvoice_tpu.ckpt.native_io import load_npz

        return load_npz(os.path.join(self.dir, "params.npz"))

    # -- results ---------------------------------------------------------

    def mark_done(self, req_id: int, audio: np.ndarray) -> None:
        final = os.path.join(self.dir, "done", f"{req_id}.npy")
        # np.save appends .npy unless the path already ends with it
        tmp = os.path.join(self.dir, "done", f".tmp.{os.getpid()}.{req_id}.npy")
        np.save(tmp, np.asarray(audio))
        os.replace(tmp, final)

    def done_ids(self) -> set[int]:
        out = set()
        for f in os.listdir(os.path.join(self.dir, "done")):
            if f.endswith(".npy") and not f.startswith("."):  # skip tmp files
                out.add(int(f[:-4]))
        return out

    def load_result(self, req_id: int) -> np.ndarray:
        return np.load(os.path.join(self.dir, "done", f"{req_id}.npy"))

    def pending_ids(self, n_total: int | None = None) -> list[int]:
        if n_total is None:
            n_total = len(self.load_requests())
        done = self.done_ids()
        return [i for i in range(n_total) if i not in done]


# ---------------------------------------------------------------------------
# Worker: one process of the (possibly shrunk) world
# ---------------------------------------------------------------------------

def worker_main(
    state_dir: str,
    cfg,
    *,
    coordinator: str | None,
    num_processes: int,
    process_id: int,
    max_batch: int = 2,
    heartbeat_timeout_s: float = 8.0,
    round_sleep_s: float = 0.0,
    die_after_round: int | None = None,
) -> None:
    """Process this world's share of the WorkLog's pending requests.

    Collective-lockstep: every process computes the SAME deterministic
    assignment (pending ids sorted, process p takes slice p::world) and the
    SAME total round count, passing [] rounds when out of local work, so
    all processes enter every collective together.  A heartbeat guards each
    round; on failure the survivor exits EX_TEMPFAIL for the Supervisor to
    relaunch a shrunk world.  Exits 0 only with zero local work left.

    die_after_round: fault injection (SURVEY §5.3) — hard-exit(9) after
    completing that round, simulating a mid-stream host death.
    """
    from openvoice_tpu.runtime import multihost as MH
    from openvoice_tpu.serve.distributed import DistRequest, DistributedConvertService

    MH.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    mesh = MH.global_mesh(model_parallel=1)
    log = WorkLog(state_dir)
    params = log.load_params()
    svc = DistributedConvertService(params, cfg, mesh)
    requests = log.load_requests()

    # deterministic assignment, agreed by construction (same files, same
    # sort) — the done/ set is stable at startup because no worker is
    # mid-flight when a world launches
    pending = log.pending_ids(len(requests))
    mine = pending[process_id::num_processes]
    per_proc = [len(pending[p::num_processes]) for p in range(num_processes)]
    n_rounds = max((-(-c // max_batch) for c in per_proc), default=0)

    monitor = MH.HeartbeatMonitor(timeout_s=heartbeat_timeout_s)
    for rnd in range(n_rounds):
        if not monitor.beat():
            print(f"[elastic worker {process_id}] peer lost; exiting for "
                  "shrunk-world relaunch", flush=True)
            sys.exit(EX_TEMPFAIL)
        ids = mine[rnd * max_batch : (rnd + 1) * max_batch]
        reqs = [
            DistRequest(
                spec=np.asarray(requests[i]["spec"], np.float32),
                n_frames=int(requests[i]["n_frames"]),
                g_src=np.asarray(requests[i]["g_src"], np.float32),
                g_tgt=np.asarray(requests[i]["g_tgt"], np.float32),
                tau=float(requests[i]["tau"]),
                seed=int(requests[i]["seed"]),
            )
            for i in ids
        ]
        outs = svc.convert_round(reqs)
        for i, audio in zip(ids, outs):
            log.mark_done(i, audio)
        if die_after_round is not None and rnd == die_after_round:
            os._exit(9)  # injected mid-stream death
        if round_sleep_s:
            time.sleep(round_sleep_s)  # test hook: widen the kill window
    print(f"[elastic worker {process_id}] done ({len(mine)} requests)", flush=True)


# ---------------------------------------------------------------------------
# Supervisor: launch, watch, shrink, relaunch
# ---------------------------------------------------------------------------

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class _RelaunchSupervisor:
    """Shared launch-watch-shrink loop: launches a world of worker
    processes, and on any failure relaunches a SHRUNK world until `done()`
    says the job is complete.

    ``worker_cmd(coordinator, num_processes, process_id) -> argv`` builds
    one worker's command line (tests point it at tests/_elastic*_child.py;
    a deployment points it at its launcher).  Subclasses define done().
    """

    def __init__(
        self,
        worker_cmd,
        *,
        world: int,
        max_restarts: int = 3,
        env: dict | None = None,
    ):
        self.worker_cmd = worker_cmd
        self.world = world
        self.max_restarts = max_restarts
        self.env = env if env is not None else dict(os.environ)
        self.restarts = 0
        self.history: list[dict] = []

    def done(self) -> bool:
        raise NotImplementedError

    def run(self, timeout_s: float = 600.0) -> bool:
        """True when done().  Each attempt launches `world` workers; on any
        failure the next attempt runs with world − 1, minimum 1 — the
        shrunk world."""
        deadline = time.monotonic() + timeout_s
        while True:
            if self.done():
                return True
            if self.restarts > self.max_restarts or time.monotonic() > deadline:
                return False
            world = max(1, self.world)
            coordinator = f"127.0.0.1:{_free_port()}" if world > 1 else None
            procs = [
                subprocess.Popen(
                    self.worker_cmd(coordinator, world, pid),
                    env=self.env,
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                )
                for pid in range(world)
            ]
            rcs, outs = [], []
            for p in procs:
                try:
                    out, _ = p.communicate(timeout=max(5.0, deadline - time.monotonic()))
                except subprocess.TimeoutExpired:
                    p.kill()
                    out, _ = p.communicate()
                outs.append(out)
                rcs.append(p.returncode)
            self.history.append({"world": world, "rcs": rcs, "outs": outs})
            if all(rc == 0 for rc in rcs) and self.done():
                return True
            # Shrink by ONE per failed attempt, not by the count of
            # non-TEMPFAIL exits: one real death mid-collective takes down
            # every peer blocked inside the collective with XLA's LOG(FATAL)
            # (a non-zero, non-TEMPFAIL code indistinguishable from the root
            # cause), so counting them would collapse an N-host world to 1
            # on a single failure.  One root-cause death per attempt is the
            # conservative assumption; a second dead host just costs one
            # more (bounded) restart.
            hard_failed = any(rc not in (0, EX_TEMPFAIL) for rc in rcs)
            self.world = max(1, world - (1 if hard_failed else 0))
            self.restarts += 1


class Supervisor(_RelaunchSupervisor):
    """Convert-serving supervisor: done = every WorkLog request has a
    result (results accrue atomically as workers complete them)."""

    def __init__(
        self,
        state_dir: str,
        worker_cmd,
        *,
        world: int,
        max_restarts: int = 3,
        env: dict | None = None,
    ):
        super().__init__(worker_cmd, world=world, max_restarts=max_restarts, env=env)
        self.log = WorkLog(state_dir)
        self._n_total: int | None = None

    def done(self) -> bool:
        if self._n_total is None:
            self._n_total = len(self.log.load_requests())
        return not self.log.pending_ids(self._n_total)


class TrainSupervisor(_RelaunchSupervisor):
    """Elastic training supervisor (SURVEY §5.3 + §5.4 composed): done =
    the checkpoint directory holds a step ≥ target.  A relaunched world —
    shrunk or same-size — resumes from ckpt/native_io.latest_step via
    training.loop.train's resume path, so a host death mid-training costs
    at most `ckpt_every` steps of rework."""

    def __init__(
        self,
        ckpt_dir: str,
        target_step: int,
        worker_cmd,
        *,
        world: int,
        max_restarts: int = 3,
        env: dict | None = None,
    ):
        super().__init__(worker_cmd, world=world, max_restarts=max_restarts, env=env)
        self.ckpt_dir = ckpt_dir
        self.target_step = target_step

    def done(self) -> bool:
        from openvoice_tpu.ckpt.native_io import latest_step

        step = latest_step(self.ckpt_dir)
        return step is not None and step >= self.target_step


def train_worker_main(
    data_root: str,
    ckpt_dir: str,
    cfg,
    *,
    coordinator: str | None,
    num_processes: int,
    process_id: int,
    steps: int,
    batch_size: int = 4,
    segment_frames: int = 16,
    ckpt_every: int = 4,
    lr: float = 2e-4,
    adversarial: bool = False,
    die_after_step: int | None = None,
    heartbeat_timeout_s: float = 8.0,
    heartbeat_every: int = 1,
) -> None:
    """One process of an elastic training world: initialize the global
    mesh, then run training.loop.train with checkpoint/resume wired — the
    loop itself resumes from latest_step, so this worker is restartable at
    any point.  A per-step heartbeat (every `heartbeat_every` steps) lets
    survivors exit EX_TEMPFAIL promptly instead of waiting for XLA's
    fatal (see module docstring); the TrainSupervisor relaunches either
    way.

    die_after_step: fault injection — hard-exit(9) right after that step's
    checkpoint gate, simulating a mid-training host death."""
    from openvoice_tpu.runtime import multihost as MH
    from openvoice_tpu.training.loop import train

    MH.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    mesh = MH.global_mesh(model_parallel=1) if num_processes > 1 else None
    monitor = MH.HeartbeatMonitor(timeout_s=heartbeat_timeout_s)

    def on_step(step: int, metrics) -> None:
        if die_after_step is not None and step >= die_after_step:
            os._exit(9)  # injected mid-training death
        if num_processes > 1 and step % max(1, heartbeat_every) == 0:
            if not monitor.beat():
                print(f"[elastic train worker {process_id}] peer lost; exiting "
                      "for relaunch", flush=True)
                sys.exit(EX_TEMPFAIL)

    train(
        data_root, cfg,
        steps=steps, batch_size=batch_size, segment_frames=segment_frames,
        lr=lr, adversarial=adversarial,
        ckpt_dir=ckpt_dir, ckpt_every=ckpt_every,
        mesh=mesh, log_every=0, on_step=on_step,
    )
    print(f"[elastic train worker {process_id}] reached step {steps}", flush=True)
