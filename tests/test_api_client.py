"""CompletionClient against an in-process OpenAI-compatible stub server
(zero-egress: everything stays on 127.0.0.1)."""
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from longspec_tpu.data.api_client import ApiError, CompletionClient, post_json


class _Stub(BaseHTTPRequestHandler):
    overflow_once = False

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        if _Stub.overflow_once:
            _Stub.overflow_once = False
            self.send_response(400)
            self.end_headers()
            self.wfile.write(b"This model's maximum context length is 8192")
            return
        if self.path == "/v1/chat/completions":
            out = {"choices": [{"message": {
                "role": "assistant",
                "content": f"chat:{body['messages'][-1]['content']}"
                           f":mt={body['max_tokens']}"}}]}
        elif self.path == "/v1/completions":
            out = {"choices": [{"text": body["prompt"] + " -> done"}
                               for _ in range(body.get("n", 1))]}
        elif self.path == "/generate":
            out = {"text": [body["prompt"] + " legacy"]}
        else:
            self.send_response(404)
            self.end_headers()
            return
        data = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_completions_strips_prompt(server):
    c = CompletionClient(f"{server}/v1/completions", max_tokens=32)
    assert c("hello") == " -> done"


def test_completions_n_gt_1_returns_list(server):
    c = CompletionClient(f"{server}/v1/completions", n=3)
    out = c("x")
    assert isinstance(out, list) and len(out) == 3


def test_chat_schema_and_system_prompt(server):
    c = CompletionClient(f"{server}/v1/chat/completions",
                         system_prompt="sys", max_tokens=64)
    assert c("ping") == "chat:ping:mt=64"


def test_legacy_generate_schema(server):
    c = CompletionClient(f"{server}/generate")
    assert c("abc") == " legacy"


def test_context_overflow_backoff(server):
    """A 'maximum context length' 400 shrinks max_tokens by 100 and retries
    (ref vllm.py:96-99)."""
    _Stub.overflow_once = True
    c = CompletionClient(f"{server}/v1/chat/completions", max_tokens=500)
    assert c("q") == "chat:q:mt=400"


def test_hard_error_raises(server):
    c = CompletionClient(f"{server}/nope", max_retry=1)
    with pytest.raises(ApiError):
        c("x")


def test_map_preserves_order(server):
    c = CompletionClient(f"{server}/v1/completions")
    outs = c.map([f"p{i}" for i in range(5)], num_workers=3)
    assert outs == [" -> done"] * 5


def test_post_json_roundtrip(server):
    data = post_json(f"{server}/generate", {"prompt": "z"})
    assert data == {"text": ["z legacy"]}


def test_extract_strips_only_leading_prompt():
    """Echoed prompts are stripped as a PREFIX only; occurrences of the
    prompt substring inside the completion body must survive (regression:
    str.replace deleted all of them)."""
    c = CompletionClient("http://x/v1/completions", max_tokens=8)
    data = {"choices": [{"text": "yes, yes it does"}]}
    # non-echoing server: completion starts with text that merely repeats
    # the prompt — nothing should be removed beyond a literal echo prefix
    assert c._extract(data, "yes") == ", yes it does"
    data2 = {"choices": [{"text": "no echo of prompt here"}]}
    assert c._extract(data2, "absent") == "no echo of prompt here"
    legacy = {"text": ["PROMPT and then PROMPT again"]}
    assert c._extract(legacy, "PROMPT ") == "and then PROMPT again"
