"""S4: HTTP serving front end over the async job surface (stdlib only).

The reference is driven through docling-serve's HTTP protocol
(scripts/test_docling_serve_hybrid_pic.py:36-90):

  GET  /health                        -> {"status": "ok"}
  POST /v1/convert/source/async       -> {"task_id": ...}     (202-style)
  GET  /v1/status/poll/{task_id}      -> {"task_status": pending|started|
                                          success|failure, ...}
  GET  /v1/result/{task_id}           -> one PAGE of the extraction result
       (?offset=&limit=, default/max page caps) + total count + parquet
       path for bulk readers — never a corpus-proportional body

This module serves the SAME protocol over ``plans/jobs.py``: submission
allocates a lineage-backed checkpointed run; a single background worker
thread runs ALL extraction work, advancing jobs group-by-group (each
advance = one idempotent Spark job); handler threads only submit specs and
run read-only lineage/output queries (concurrent job submission is
thread-safe on a SparkSession).  Status lives in the lineage table, so a
killed server resumes exactly where it stopped and any number of front
ends can serve the same job root.

Request body: {"sources": [{"kind": "sf_dir", "path": "/data/sfX"}],
"options": {"n_groups": 8}} — the engine's sources are parquet/Iceberg
table dirs, not PDF URLs; everything else mirrors the reference protocol.
"""

from __future__ import annotations

import json
import os
import queue
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

from pyspark.sql import SparkSession

from ..plans.jobs import PENDING, SUCCESS, ExtractJob, advance_job, load_job, poll_job, submit_job

_TASK_RE = re.compile(r"^/v1/(status/poll|result)/([0-9a-f]{12})$")


MAX_ADVANCE_ATTEMPT_FAILURES = 3
MAX_GROUPS = 4096
# /v1/result paging: default page size, and the hard per-request cap — the
# one knob that keeps a result fetch bounded regardless of corpus size
DEFAULT_RESULT_LIMIT = 1000
MAX_RESULT_LIMIT = 10_000


class ServeContext:
    """Shared state: the Spark session (extraction work on the worker
    thread; read-only polls from handler threads), the job root, and the
    advance queue feeding the single worker."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.tasks: queue.Queue[str] = queue.Queue()
        self.failures: dict[str, str] = {}
        self._attempt_failures: dict[str, int] = {}
        # task_id -> total span count, filled on the first result fetch so
        # a client draining N pages costs ONE count job, not N (the output
        # of a finished job is immutable, so the cache never goes stale)
        self.result_counts: dict[str, int] = {}
        self._counts_lock = threading.Lock()
        self._stop = threading.Event()
        self.worker = threading.Thread(target=self._work, daemon=True)

    def total_spans(self, task_id: str, out) -> int:
        with self._counts_lock:
            cached = self.result_counts.get(task_id)
        if cached is not None:
            return cached
        n = out.count()
        with self._counts_lock:
            self.result_counts[task_id] = n
        return n

    def start(self) -> None:
        self._resume_inflight()
        self.worker.start()

    def _resume_inflight(self) -> None:
        """Restart-resume: re-enqueue every job spec under the root whose
        lineage says it has not finished — this is what makes a killed
        server pick up exactly where it stopped."""
        if not os.path.isdir(self.root):
            return
        for task_id in sorted(os.listdir(self.root)):
            try:
                job = load_job(self.root, task_id)
            except (FileNotFoundError, NotADirectoryError, KeyError,
                    ValueError, json.JSONDecodeError):
                continue  # stray files / corrupt specs must not block startup
            try:
                done = poll_job(self.spark, job)["task_status"] == SUCCESS
            except Exception:
                # a corrupt lineage table must fail only ITS task (the
                # worker will surface it), never block the whole server
                done = False
            if not done:
                self.tasks.put(task_id)

    def stop(self) -> None:
        self._stop.set()
        self.tasks.put("")  # wake the worker
        self.worker.join(timeout=30)

    def _work(self) -> None:
        """Drain the queue; each iteration advances ONE group of one job so
        a long job cannot starve later submissions (round-robin re-enqueue).
        Transient advance failures retry (the checkpointed run is
        idempotent); only MAX_ADVANCE_ATTEMPT_FAILURES consecutive errors
        mark the task failed."""
        while not self._stop.is_set():
            task_id = self.tasks.get()
            if self._stop.is_set() or not task_id:
                continue
            try:
                job = load_job(self.root, task_id)
                advance_job(self.spark, job, max_groups=1)
                self._attempt_failures.pop(task_id, None)
                if poll_job(self.spark, job)["task_status"] != SUCCESS:
                    self.tasks.put(task_id)
            except Exception as exc:
                n = self._attempt_failures.get(task_id, 0) + 1
                self._attempt_failures[task_id] = n
                if n < MAX_ADVANCE_ATTEMPT_FAILURES:
                    self.tasks.put(task_id)  # idempotent: safe to retry
                else:
                    self.failures[task_id] = f"{type(exc).__name__}: {exc}"


class _Handler(BaseHTTPRequestHandler):
    ctx: ServeContext  # set by make_server

    # -- plumbing ---------------------------------------------------------
    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet: tests/servers own the log
        pass

    def _job(self, task_id: str) -> ExtractJob | None:
        try:
            return load_job(self.ctx.root, task_id)
        except (FileNotFoundError, NotADirectoryError, KeyError,
                ValueError, json.JSONDecodeError):
            # missing OR corrupt/truncated spec both read as "unknown task"
            # rather than killing the handler thread
            return None

    # -- protocol ---------------------------------------------------------
    def do_GET(self) -> None:
        if self.path == "/health":
            self._json(200, {"status": "ok"})
            return
        split = urlsplit(self.path)
        m = _TASK_RE.match(split.path)
        if not m:
            self._json(404, {"error": "unknown endpoint"})
            return
        endpoint, task_id = m.groups()
        job = self._job(task_id)
        if job is None:
            self._json(404, {"error": f"unknown task_id {task_id}"})
            return
        status = poll_job(self.ctx.spark, job)
        # the durable lineage status WINS over process-local failure state:
        # another front end sharing the root may have finished the job
        if status["task_status"] != SUCCESS and task_id in self.ctx.failures:
            self._json(
                200,
                {
                    "task_id": task_id,
                    "task_status": "failure",
                    "error_message": self.ctx.failures[task_id],
                },
            )
            return
        if endpoint == "status/poll":
            self._json(200, status)
            return
        # /v1/result — PAGINATED: a result fetch must never materialize a
        # corpus-proportional span set on the driver (or in one HTTP body).
        # Clients page with ?offset=&limit= over the global
        # (doc_id, offset) order; n_spans carries the total so a client
        # knows when it has drained the result, and out_path lets bulk
        # consumers scan the parquet directly instead of paging over HTTP.
        if status["task_status"] != SUCCESS:
            self._json(409, {"error": "task not finished", **status})
            return
        try:
            params = parse_qs(split.query)
            page_offset = int(params.get("offset", ["0"])[0])
            page_limit = int(params.get("limit", [str(DEFAULT_RESULT_LIMIT)])[0])
            if page_offset < 0:
                raise ValueError("offset must be >= 0")
            if not 1 <= page_limit <= MAX_RESULT_LIMIT:
                raise ValueError(f"limit must be in [1, {MAX_RESULT_LIMIT}]")
        except (ValueError, TypeError) as exc:
            self._json(400, {"error": str(exc)})
            return
        out = self.ctx.spark.read.parquet(job.run.out_path)
        # 'group' is checkpoint bookkeeping (the resume key), not a span field
        rows = (
            out.drop("group")
            .orderBy("doc_id", "offset")
            .offset(page_offset)
            .limit(page_limit)
            .collect()
        )
        self._json(
            200,
            {
                "task_id": task_id,
                "n_spans": self.ctx.total_spans(task_id, out),
                "offset": page_offset,
                "limit": page_limit,
                "returned": len(rows),
                "out_path": job.run.out_path,
                "spans": [row.asDict() for row in rows],
            },
        )

    def do_POST(self) -> None:
        if self.path != "/v1/convert/source/async":
            self._json(404, {"error": "unknown endpoint"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            body = json.loads(self.rfile.read(length) or b"{}")
            source = body["sources"][0]
            if source.get("kind") != "sf_dir":
                raise ValueError("sources[0].kind must be 'sf_dir'")
            sf_dir = source["path"]
            options = body.get("options") or {}
            n_groups = int(options.get("n_groups", 8))
            if not 1 <= n_groups <= MAX_GROUPS:
                raise ValueError(f"n_groups must be in [1, {MAX_GROUPS}]")
        except (
            KeyError,
            IndexError,
            ValueError,
            TypeError,
            AttributeError,
            json.JSONDecodeError,
        ) as exc:
            # wrong-SHAPE bodies (non-dict root, non-dict source, bad
            # numeric types) must 400, not kill the handler thread
            self._json(400, {"error": str(exc)})
            return
        job = submit_job(sf_dir, self.ctx.root, n_groups=n_groups)
        self.ctx.tasks.put(job.task_id)
        self._json(
            200, {"task_id": job.task_id, "task_status": PENDING}
        )


def make_server(
    spark: SparkSession, root: str, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, ServeContext]:
    """Build (but do not start) the server + worker; port 0 = ephemeral.
    Call ``ctx.start()`` then ``server.serve_forever()`` (or run it in a
    thread); shut down with ``server.shutdown(); ctx.stop()``."""
    ctx = ServeContext(spark, root)
    handler = type("Handler", (_Handler,), {"ctx": ctx})
    server = ThreadingHTTPServer((host, port), handler)
    return server, ctx
