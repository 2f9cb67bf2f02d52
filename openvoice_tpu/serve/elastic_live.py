"""LIVE elastic multi-process serving: BASELINE config 5 as one composition.

r4 proved the pieces separately — lock-step SPMD rounds over pre-agreed
batches (serve/distributed.py) and elastic re-runs of a STATIC WorkLog
(runtime/elastic.py).  This module composes them for a live stream
(VERDICT r4 next #1): requests arrive over time, per host, behind an HTTP
tier; a ROUND PACER turns them into paced collective rounds (hosts with no
work contribute empty rounds — the protocol's padding rows make that
free); every request and result persists in a LiveWorkLog, so a host death
mid-stream costs nothing — the relaunched (shrunk) world picks up exactly
the pending requests, while new ones keep arriving.

Why this shape (and not a work queue with locks): under `jax.distributed`
every process must enter the SAME compiled collective in the SAME order,
so free-running per-host consumers are impossible — the pacer IS the
scheduler, and all coordination reduces to (a) one tiny metadata
all-gather per round (stop vote + global pending count) and (b) the
filesystem's atomic rename.  Request→worker assignment is `id % world ==
process_id`: stable under inconsistent directory views (two hosts may see
different request subsets mid-write — modulo assignment can never hand
the same id to two hosts, unlike slice-partitioning a sorted list).

No reference counterpart: the reference is single-process Gradio
(/root/reference/openvoice/openvoice_app.py); SURVEY §2.3/§5.3 specify
this tier.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

from openvoice_tpu.runtime.elastic import EX_TEMPFAIL, WorkLog, _RelaunchSupervisor


# ---------------------------------------------------------------------------
# Live work log: requests appended while workers run
# ---------------------------------------------------------------------------

class LiveWorkLog(WorkLog):
    """WorkLog whose request set GROWS over time.

    Each request is one file ``req/<id>.npz`` made visible atomically
    (tmp-then-link, so a reader never sees a half request and two feeders
    never claim the same id); results reuse the parent's atomic
    ``done/<id>.npy``.  A ``stop`` marker file asks the world to drain and
    exit once nothing is pending."""

    def __init__(self, state_dir: str):
        super().__init__(state_dir)
        os.makedirs(os.path.join(state_dir, "req"), exist_ok=True)

    # -- append-only request files --------------------------------------

    def append_request(self, req: dict) -> int:
        """Persist one request, returns its id.  Safe under concurrent
        feeders: the hard link fails with EEXIST on an id collision and
        the next id is tried."""
        tmp = os.path.join(self.dir, "req", f".tmp.{os.getpid()}.{time.monotonic_ns()}.npz")
        np.savez(tmp, **{k: np.asarray(v) for k, v in req.items()})
        try:
            req_id = self._next_id()
            while True:
                final = os.path.join(self.dir, "req", f"{req_id}.npz")
                try:
                    os.link(tmp, final)
                    return req_id
                except FileExistsError:
                    req_id += 1
        finally:
            os.unlink(tmp)

    def _next_id(self) -> int:
        ids = self.request_ids()
        return (max(ids) + 1) if ids else 0

    def request_ids(self) -> list[int]:
        out = []
        for f in os.listdir(os.path.join(self.dir, "req")):
            if f.endswith(".npz") and not f.startswith("."):
                out.append(int(f[:-4]))
        return sorted(out)

    def load_request(self, req_id: int) -> dict:
        with np.load(os.path.join(self.dir, "req", f"{req_id}.npz")) as z:
            return {k: z[k] for k in z.files}

    def live_pending_ids(self) -> list[int]:
        done = self.done_ids()
        return [i for i in self.request_ids() if i not in done]

    # -- drain signal ----------------------------------------------------

    def signal_stop(self) -> None:
        open(os.path.join(self.dir, "stop"), "w").close()

    def stop_requested(self) -> bool:
        return os.path.exists(os.path.join(self.dir, "stop"))


# ---------------------------------------------------------------------------
# Round pacer: the worker-side loop
# ---------------------------------------------------------------------------

def live_worker_main(
    state_dir: str,
    cfg,
    *,
    coordinator: str | None,
    num_processes: int,
    process_id: int,
    max_batch: int = 2,
    cadence_s: float = 0.05,
    heartbeat_timeout_s: float = 8.0,
    die_after_done: int | None = None,
) -> None:
    """One process of the live serving world.  Each round, in lock-step:

    1. heartbeat (collective with timeout — a dead peer turns into a
       prompt EX_TEMPFAIL exit instead of a hung collective);
    2. tiny metadata all-gather: (my stop vote, my pending-assigned
       count) — all processes see the same totals, so the stop decision
       is agreed without extra coordination;
    3. `convert_round` over up to `max_batch` of MY pending requests
       (id % world == process_id) — possibly none: empty rounds ride the
       protocol's all-padding rows;
    4. results land atomically in done/.

    Exits 0 only on the agreed stop (stop marker present everywhere AND
    zero pending globally).  die_after_done: fault injection — hard
    exit(9) once this process has completed that many requests.
    """
    from openvoice_tpu.runtime import multihost as MH
    from openvoice_tpu.serve.distributed import DistRequest, DistributedConvertService

    MH.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    mesh = MH.global_mesh(model_parallel=1)
    log = LiveWorkLog(state_dir)
    svc = DistributedConvertService(log.load_params(), cfg, mesh)
    monitor = MH.HeartbeatMonitor(timeout_s=heartbeat_timeout_s)
    completed = 0

    while True:
        if not monitor.beat():
            print(f"[live worker {process_id}] peer lost; exiting for "
                  "shrunk-world relaunch", flush=True)
            sys.exit(EX_TEMPFAIL)

        mine = [i for i in log.live_pending_ids() if i % num_processes == process_id]
        meta = np.asarray([int(log.stop_requested()), len(mine)], np.int64)
        if num_processes > 1:
            from jax.experimental import multihost_utils

            allmeta = np.asarray(multihost_utils.process_allgather(meta))
            all_stop = bool(allmeta[:, 0].all())
            global_pending = int(allmeta[:, 1].sum())
        else:
            all_stop = bool(meta[0])
            global_pending = int(meta[1])
        if all_stop and global_pending == 0:
            break

        batch_ids = mine[:max_batch]
        reqs = []
        for i in batch_ids:
            r = log.load_request(i)
            reqs.append(DistRequest(
                spec=np.asarray(r["spec"], np.float32),
                n_frames=int(r["n_frames"]),
                g_src=np.asarray(r["g_src"], np.float32),
                g_tgt=np.asarray(r["g_tgt"], np.float32),
                tau=float(r["tau"]),
                seed=int(r["seed"]),
            ))
        outs = svc.convert_round(reqs)  # collective — also entered when empty
        for i, audio in zip(batch_ids, outs):
            log.mark_done(i, audio)
            completed += 1
            if die_after_done is not None and completed >= die_after_done:
                os._exit(9)  # injected mid-stream death
        if not batch_ids:
            time.sleep(cadence_s)  # idle round: don't spin the filesystem
    print(f"[live worker {process_id}] drained ({completed} completed)", flush=True)


class LiveSupervisor(_RelaunchSupervisor):
    """Relaunch supervisor for the live stream: done = the feeders have
    signalled stop AND every appended request has a result.  (The static
    Supervisor's done fires on an empty log — meaningless here, where the
    log starts empty and grows.)"""

    def __init__(self, state_dir: str, worker_cmd, *, world: int,
                 max_restarts: int = 3, env: dict | None = None):
        super().__init__(worker_cmd, world=world, max_restarts=max_restarts, env=env)
        self.log = LiveWorkLog(state_dir)

    def done(self) -> bool:
        return self.log.stop_requested() and not self.log.live_pending_ids()


# ---------------------------------------------------------------------------
# Per-host frontend: HTTP tier over the live log
# ---------------------------------------------------------------------------

class ElasticConvertClient:
    """Host-side submit/await API over the LiveWorkLog — what the HTTP
    tier (and tests) use.  Results are awaited by polling the atomic done
    files; the serving world may die and relaunch underneath without the
    client noticing anything but latency."""

    def __init__(self, state_dir: str, cfg, poll_s: float = 0.02):
        self.log = LiveWorkLog(state_dir)
        self.cfg = cfg
        self.poll_s = poll_s

    def submit(self, spec: np.ndarray, g_src, g_tgt, tau: float = 0.3,
               seed: int = 0) -> int:
        spec = np.asarray(spec, np.float32)
        return self.log.append_request({
            "spec": spec, "n_frames": np.int64(spec.shape[0]),
            "g_src": np.asarray(g_src, np.float32).reshape(-1),
            "g_tgt": np.asarray(g_tgt, np.float32).reshape(-1),
            "tau": np.float64(tau), "seed": np.int64(seed),
        })

    def result(self, req_id: int, timeout: float = 120.0) -> np.ndarray:
        deadline = time.monotonic() + timeout
        path = os.path.join(self.log.dir, "done", f"{req_id}.npy")
        while time.monotonic() < deadline:
            if os.path.exists(path):
                return self.log.load_result(req_id)
            time.sleep(self.poll_s)
        raise TimeoutError(f"request {req_id} not completed in {timeout}s")

    def convert(self, spec, g_src, g_tgt, tau: float = 0.3, seed: int = 0,
                timeout: float = 120.0) -> np.ndarray:
        return self.result(self.submit(spec, g_src, g_tgt, tau, seed), timeout)


def make_elastic_handler(client: ElasticConvertClient):
    """HTTP handler over the live elastic world: POST /convert with
    {spec_b64 [T,F] f32, src_se, tgt_se, tau?, seed?} → f32 audio;
    GET /healthz; GET /pending (queue introspection).  Same per-request
    isolation discipline as serve/server.py."""
    import base64
    import json
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _json(self, code: int, payload: dict) -> None:
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/pending":
                self._json(200, {"pending": client.log.live_pending_ids()})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/convert":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                n_frames = int(req["n_frames"])
                spec = np.frombuffer(
                    base64.b64decode(req["spec_b64"]), np.float32
                ).reshape(n_frames, -1)
                out = client.convert(
                    spec, np.asarray(req["src_se"], np.float32),
                    np.asarray(req["tgt_se"], np.float32),
                    tau=float(req.get("tau", 0.3)), seed=int(req.get("seed", 0)),
                    timeout=float(req.get("timeout", 120.0)),
                )
                self._json(200, {
                    "encoding": "f32",
                    "audio_b64": base64.b64encode(
                        np.asarray(out, np.float32).tobytes()).decode(),
                })
            except Exception as exc:  # noqa: BLE001 — per-request isolation
                self._json(500, {"error": f"[ERROR] {exc}"})

    return Handler


def serve_elastic(client: ElasticConvertClient, host: str = "127.0.0.1",
                  port: int = 0):
    """Start the HTTP tier; returns the ThreadingHTTPServer (its
    .server_address carries the bound port when port=0)."""
    import threading
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer((host, port), make_elastic_handler(client))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd
