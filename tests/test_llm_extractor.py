"""LLMExtractor retry/backoff contract against a localhost OpenAI-shaped
stub (VERDICT r2 task 9): ≤3 attempts, 2 s ×1.5 backoff sequence, and
row-equivalence with the deterministic engine when the stub answers with
the deterministic extraction (the LLM interface is a drop-in)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from deep_reason_spark.datagen import generate_repo_files
from deep_reason_spark.operators.chunker import chunk_repo_files
from deep_reason_spark.operators.extractor import (
    LLMExtractor,
    extract_from_text,
    extract_triples,
)

KEY = ["subject", "predicate", "object", "document_id", "order_id",
       "content_sha256"]


class _Stub(BaseHTTPRequestHandler):
    """OpenAI-compatible /v1/chat/completions stub. Behavior per server:
    fail the first ``fail_n`` requests (HTTP 500 or garbage content), then
    answer with the DETERMINISTIC extraction of each chunk."""

    def do_POST(self):  # noqa: N802 — http.server API
        srv = self.server
        srv.n_requests += 1
        if srv.n_requests <= srv.fail_n:
            if srv.fail_mode == "http":
                self.send_response(500)
                self.end_headers()
                return
            content = "not json at all {"
        else:
            body = json.loads(self.rfile.read(
                int(self.headers["Content-Length"])).decode("utf-8"))
            prompt = json.loads(body["messages"][0]["content"])
            answer = [
                [list(t) for t in extract_from_text(
                    ch["text"], context_entities=ch["context_entities"])]
                for ch in prompt["chunks"]
            ]
            content = json.dumps(answer)
        out = json.dumps(
            {"choices": [{"message": {"content": content}}]}).encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture
def stub():
    servers = []

    def start(fail_n=0, fail_mode="http"):
        srv = HTTPServer(("127.0.0.1", 0), _Stub)
        srv.n_requests, srv.fail_n, srv.fail_mode = 0, fail_n, fail_mode
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        return srv, f"http://127.0.0.1:{srv.server_port}"

    yield start
    for srv in servers:
        srv.shutdown()
        srv.server_close()


_CHUNK = {"text": "Ada Lovelace developed Vector Store.",
          "context_entities": []}


def test_requires_endpoint():
    with pytest.raises(NotImplementedError):
        LLMExtractor()


def test_retries_then_succeeds_with_backoff_sequence(stub):
    srv, url = stub(fail_n=2, fail_mode="http")
    sleeps: list[float] = []
    ext = LLMExtractor(url, sleeper=sleeps.append)
    out = ext.extract_batch([_CHUNK])
    assert out == [[("Ada Lovelace", "developed", "Vector Store")]]
    assert srv.n_requests == 3            # ≤3 attempts, 3rd succeeds
    assert sleeps == [2.0, 3.0]           # 2 s, then ×1.5 — no sleep after last


def test_parse_failure_retries_like_http_failure(stub):
    srv, url = stub(fail_n=1, fail_mode="garbage")
    sleeps: list[float] = []
    ext = LLMExtractor(url, sleeper=sleeps.append)
    out = ext.extract_batch([_CHUNK])
    assert srv.n_requests == 2 and sleeps == [2.0]
    assert out[0][0] == ("Ada Lovelace", "developed", "Vector Store")


def test_gives_up_after_max_retries(stub):
    srv, url = stub(fail_n=99, fail_mode="http")
    sleeps: list[float] = []
    ext = LLMExtractor(url, sleeper=sleeps.append)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        ext.extract_batch([_CHUNK])
    assert srv.n_requests == 3 and sleeps == [2.0, 3.0]


def test_shape_mismatch_is_a_parse_failure(stub):
    # server answers for 1 chunk; asking for 2 must retry then give up
    srv, url = stub(fail_n=0)
    ext = LLMExtractor(url, sleeper=lambda s: None)

    orig = ext._request
    ext._request = lambda prompt: json.dumps([[["A", "b", "C"]]])  # 1 entry
    with pytest.raises(RuntimeError):
        ext.extract_batch([_CHUNK, _CHUNK])
    ext._request = orig


def test_dataframe_path_row_equivalent_with_deterministic_engine(spark, stub):
    srv, url = stub()
    chunks = chunk_repo_files(generate_repo_files(spark, 40)).localCheckpoint()
    via_llm = LLMExtractor(url).extract(chunks).select(*KEY)
    deterministic = extract_triples(chunks, engine="python").select(*KEY)
    assert via_llm.exceptAll(deterministic).count() == 0
    assert deterministic.exceptAll(via_llm).count() == 0
    assert srv.n_requests >= 1
