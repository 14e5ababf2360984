"""S7 HTTP syslog ingest conformance (reference README.md:429-470): text,
JSON and chunked-stream POSTs, skip policy, envelope == serial oracle."""

import http.client
import json
import time

import pytest

from logparse_rs_ray.core.schema import TYPE_INDEX
from logparse_rs_ray.core.tokenize import split_csv
from logparse_rs_ray.webtext import generate_webtext_table, pan_schema

from .oracle import extract_csv


@pytest.fixture()
def server(tmp_path):
    from logparse_rs_ray.sources.http_ingest import SyslogIngestServer

    out = str(tmp_path / "ingest.ndjson")
    srv = SyslogIngestServer(out, schema=pan_schema(), port=0, batch_size=64)
    srv.start()
    yield srv, out
    try:
        srv.stop()
    except Exception:
        pass


def _post(port, path, body, ctype="text/plain", chunked=False):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    if chunked:
        conn.putrequest("POST", path)
        conn.putheader("Transfer-Encoding", "chunked")
        conn.putheader("Content-Type", ctype)
        conn.endheaders()
        data = body.encode() if isinstance(body, str) else body
        for i in range(0, len(data), 37):  # odd chunk size splits lines mid-way
            chunk = data[i:i + 37]
            conn.send(f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n")
        conn.send(b"0\r\n\r\n")
    else:
        conn.request("POST", path, body, {"Content-Type": ctype})
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    return r.status, out


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", path)
    r = conn.getresponse()
    body = r.read()
    conn.close()
    return r.status, body


def _wait_drained(srv, deadline=15.0):
    t0 = time.time()
    while time.time() - t0 < deadline:
        if srv._q.empty():
            time.sleep(0.1)  # let the in-flight hop append
            if srv._q.empty():
                return
        time.sleep(0.02)
    raise TimeoutError("ingest queue did not drain")


class TestHttpIngest:
    def test_text_json_and_stream_roundtrip(self, server):
        srv, out = server
        schema = pan_schema()
        table = generate_webtext_table(120, seed=42)
        # one syslog MESSAGE = one line: post the embedded CSV payloads
        # (webtext page text is multi-line; extract_csv is the serial oracle)
        texts = [extract_csv(t) for t in table["text"].to_pylist()]

        third = len(texts) // 3
        status, r = _post(srv.port, "/syslog", "\n".join(texts[:third]))
        assert status == 200 and r["enqueued"] == third
        status, r = _post(srv.port, "/syslog",
                          json.dumps({"messages": texts[third:2 * third]}),
                          ctype="application/json")
        assert status == 200 and r["enqueued"] == third
        status, r = _post(srv.port, "/syslog/stream",
                          "\n".join(texts[2 * third:]), chunked=True)
        assert status == 200 and r["enqueued"] == len(texts) - 2 * third

        _wait_drained(srv)

        # serial oracle: every clean line appears exactly once with the
        # reference envelope fields
        want_ok = 0
        want_excerpts = set()
        for text in texts:
            payload = extract_csv(text)
            fields = split_csv(payload)
            if len(fields) > TYPE_INDEX and fields[TYPE_INDEX] in schema.type_to_fields:
                want_ok += 1
                want_excerpts.add(payload[:256])

        with open(out) as fh:
            lines = [json.loads(l) for l in fh if l.strip()]
        assert len(lines) == want_ok
        for l in lines:
            assert set(l) == {"parsed", "raw_excerpt", "hash64", "runtime_ns"}
            assert l["runtime_ns"] > 0
            assert l["raw_excerpt"] in want_excerpts

    def test_healthz_metrics_and_skip_policy(self, server):
        srv, out = server
        _post(srv.port, "/syslog", "not,a,valid,line\n\n")
        _post(srv.port, "/syslog", json.dumps({"message": "x"}),
              ctype="application/json")
        _wait_drained(srv)

        status, body = _get(srv.port, "/healthz")
        assert status == 200
        h = json.loads(body)
        assert h["status"] == "ok"
        assert h["ingested"] == 2           # blank line dropped at enqueue
        assert h["parsed_ok"] == 0          # both malformed -> skipped
        assert h["skipped"] == 2

        status, body = _get(srv.port, "/metrics")
        assert status == 200
        assert b"syslog_ingest_parsed_ok 0" in body

    def test_bad_requests(self, server):
        srv, _ = server
        status, _ = _post(srv.port, "/nope", "x")
        assert status == 404
        status, _ = _post(srv.port, "/syslog", "{broken", ctype="application/json")
        assert status == 400
        status, _ = _post(srv.port, "/syslog", json.dumps({"nope": 1}),
                          ctype="application/json")
        assert status == 400
        # non-dict JSON bodies must 400, not crash the handler thread
        status, _ = _post(srv.port, "/syslog", '"bare string"',
                          ctype="application/json")
        assert status == 400
        status, _ = _post(srv.port, "/syslog", '["a", "list"]',
                          ctype="application/json")
        assert status == 400
