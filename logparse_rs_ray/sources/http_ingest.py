"""HTTP syslog ingest service — the reference's FastAPI example (S7,
reference README.md:429-470) re-expressed on the stdlib (FastAPI/uvicorn
are not in this container; the semantics, not the framework, are the
surface):

* ``POST /syslog``        — text/plain (newline-split) or JSON
  ``{"message": "..."}`` / ``{"messages": [...]}``
* ``POST /syslog/stream`` — chunked/streaming body, lines enqueued as they
  arrive
* ``GET /healthz``        — health + queue stats (JSON)
* ``GET /metrics``        — simple text metrics

A background "hop loop" thread drains the queue in batches of
``batch_size`` and parses each batch VECTORIZED through ``WebtextParser``
(the Rayon-backed ``parse_kv_enriched_batch`` analog — one Arrow batch per
hop, no per-line Python parsing), appending enriched NDJSON envelopes
(``{"parsed": ..., "raw_excerpt": ..., "hash64": ...}``, mirroring
``parse_kv_enriched()`` output / pipelines/ndjson.py) to ``out_path``.
Malformed lines follow the skip policy and are counted, not written.

This is the single-node service tier; it deliberately does NOT touch Ray
(the reference example is a single-process service too).  Env hooks match
the reference: ``SCHEMA_JSON_PATH``, ``OUT_NDJSON``, ``BATCH_SIZE``.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pyarrow as pa

from ..core.schema import CompiledSchema

__all__ = ["SyslogIngestServer"]


class SyslogIngestServer:
    """Threaded HTTP ingest server with a batching parse loop.

    Usage::

        srv = SyslogIngestServer(out_path, schema=..., port=0)
        srv.start()            # background threads
        ... POST lines ...
        srv.stop()             # drains the queue, flushes NDJSON
    """

    def __init__(self, out_path: str | None = None, *,
                 schema: CompiledSchema | None = None, host: str = "127.0.0.1",
                 port: int = 0, batch_size: int | None = None):
        from ..stages.parse import WebtextParser
        from ..webtext import pan_schema

        if schema is None:
            sp = os.environ.get("SCHEMA_JSON_PATH")
            if sp:
                from ..core.schema import load_schema

                schema = load_schema(sp)
            else:
                schema = pan_schema()
        self.schema = schema
        self.out_path = out_path or os.environ.get("OUT_NDJSON", "/tmp/syslog_ingest.ndjson")
        self.batch_size = batch_size or int(os.environ.get("BATCH_SIZE", "1024"))
        self._parser = WebtextParser(schema, on_error="skip",
                                     strip_syslog_prefix=True, record_timing=True)
        self._q: queue.Queue[str] = queue.Queue()
        self._stats = {"ingested": 0, "parsed_ok": 0, "skipped": 0, "hops": 0,
                       "write_errors": 0}
        self.last_error: str | None = None
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self.port = self._httpd.server_address[1]
        self._threads: list[threading.Thread] = []

    # --- lifecycle ----------------------------------------------------------

    def start(self) -> None:
        t1 = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t2 = threading.Thread(target=self._hop_loop, daemon=True)
        t1.start(); t2.start()
        self._threads = [t1, t2]

    def stop(self) -> None:
        self._httpd.shutdown()       # stop accepting new connections
        # server_close() joins in-flight handler threads (ThreadingHTTPServer
        # block_on_close) and releases the listening socket — only AFTER that
        # is the queue's final content known, so acknowledged lines can't
        # race past the hop loop's exit check
        self._httpd.server_close()
        self._stop.set()
        self._threads[1].join(timeout=30)

    # --- hop loop (the batching parser) ------------------------------------

    def _drain(self, max_lines: int) -> list[str]:
        lines: list[str] = []
        while len(lines) < max_lines:
            try:
                lines.append(self._q.get_nowait())
            except queue.Empty:
                break
        return lines

    def _hop_loop(self) -> None:
        while not (self._stop.is_set() and self._q.empty()):
            lines = self._drain(self.batch_size)
            if not lines:
                self._stop.wait(0.02)
                continue
            try:
                self._parse_and_append(lines)
            except Exception as e:  # noqa: BLE001 — the hop thread must
                # survive write failures (missing dir, disk full): the old
                # behavior silently killed the thread while the server kept
                # accepting lines and /healthz kept reporting ok (ADVICE
                # r02).  Count + surface instead; the batch is dropped
                # (at-most-once on write failure, like the reference's
                # skip policy) rather than requeued to avoid a hot loop.
                with self._lock:
                    self._stats["write_errors"] += 1
                    self.last_error = f"{type(e).__name__}: {e}"
            with self._lock:
                self._stats["hops"] += 1

    def _parse_and_append(self, lines: list[str]) -> None:
        batch = pa.table({"text": pa.array(lines, type=pa.string())})
        parsed = self._parser(batch)
        err = parsed["_error"].to_pylist()
        lt = parsed["log_type"].to_pylist()
        ns = parsed["_parse_ns"].to_pylist()
        h = parsed["hash64"].to_pylist()
        ex = parsed["raw_excerpt"].to_pylist()
        cols = {t: {c: parsed[c].to_pylist() for c in cs}
                for t, cs in self.schema.type_to_columns.items()}
        out_lines: list[str] = []
        ok = skipped = 0
        for i in range(parsed.num_rows):
            if err[i] != "" or lt[i] not in cols:
                skipped += 1
                continue
            envelope = {
                "parsed": {c: vals[i] for c, vals in cols[lt[i]].items()},
                "raw_excerpt": ex[i],
                "hash64": h[i],
                "runtime_ns": ns[i],
            }
            out_lines.append(json.dumps(envelope, separators=(",", ":")))
            ok += 1
        if out_lines:
            # the hop loop is the only writer of out_path — no lock needed
            # for the append, and holding one would stall /healthz and every
            # enqueue behind disk latency
            with open(self.out_path, "a", encoding="utf-8") as fh:
                fh.write("\n".join(out_lines) + "\n")
        with self._lock:
            self._stats["parsed_ok"] += ok
            self._stats["skipped"] += skipped

    # --- HTTP layer ---------------------------------------------------------

    def _enqueue(self, lines: list[str]) -> int:
        n = 0
        for ln in lines:
            ln = ln.strip("\r\n")
            if ln:
                self._q.put(ln)
                n += 1
        with self._lock:
            self._stats["ingested"] += n
        return n

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr noise
                pass

            def _reply(self, code: int, body: bytes, ctype: str = "application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                with server._lock:
                    stats = dict(server._stats)
                    last_error = server.last_error
                stats["queue_depth"] = server._q.qsize()
                if self.path == "/healthz":
                    status = "degraded" if stats["write_errors"] else "ok"
                    body = {"status": status, **stats}
                    if last_error:
                        body["last_error"] = last_error
                    self._reply(200, json.dumps(body).encode())
                elif self.path == "/metrics":
                    text = "".join(f"syslog_ingest_{k} {v}\n" for k, v in stats.items())
                    self._reply(200, text.encode(), "text/plain")
                else:
                    self._reply(404, b'{"error":"not found"}')

            def do_POST(self):
                if self.path not in ("/syslog", "/syslog/stream"):
                    self._reply(404, b'{"error":"not found"}')
                    return
                if self.path == "/syslog/stream" and \
                        self.headers.get("Transfer-Encoding", "").lower() == "chunked":
                    n = 0
                    buf = b""
                    while True:  # RFC 7230 chunked framing
                        size_line = self.rfile.readline().strip()
                        try:
                            size = int(size_line.split(b";")[0], 16)
                        except ValueError:
                            break
                        if size == 0:
                            self.rfile.readline()
                            break
                        chunk = self.rfile.read(size)
                        self.rfile.readline()
                        buf += chunk
                        *complete, buf = buf.split(b"\n")
                        n += server._enqueue([l.decode("utf-8", "replace") for l in complete])
                    if buf:
                        n += server._enqueue([buf.decode("utf-8", "replace")])
                    self._reply(200, json.dumps({"enqueued": n}).encode())
                    return
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "text/plain")
                if ctype.startswith("application/json"):
                    try:
                        payload = json.loads(body.decode("utf-8"))
                    except json.JSONDecodeError:
                        self._reply(400, b'{"error":"bad json"}')
                        return
                    if not isinstance(payload, dict):
                        # a bare string/array would pass the `in` checks via
                        # substring/element membership and then crash
                        self._reply(400, b'{"error":"need a json object"}')
                        return
                    if "messages" in payload:
                        lines = [str(m) for m in payload["messages"]]
                    elif "message" in payload:
                        lines = [str(payload["message"])]
                    else:
                        self._reply(400, b'{"error":"need message or messages"}')
                        return
                else:
                    lines = body.decode("utf-8", "replace").split("\n")
                n = server._enqueue(lines)
                self._reply(200, json.dumps({"enqueued": n}).encode())

        return Handler
