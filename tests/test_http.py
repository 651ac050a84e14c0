"""OpenAI-compatible HTTP front-end over the continuous-batching server:
concurrent requests through real sockets must return token-exact results
(vs standalone generation) and work with the bundled CompletionClient."""
import json
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from longspec_tpu.config import DraftConfig, EngineConfig, tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.engine.engine import SpecEngine
from longspec_tpu.serve import SpecServer, HttpFrontend
from longspec_tpu.data.api_client import CompletionClient, post_json


@pytest.fixture(scope="module")
def frontend():
    cfg = tiny_test(vocab_size=211, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg)
    eng = SpecEngine(params, dparams, cfg, DraftConfig(window=8),
                     EngineConfig(tree_shape=(2, 3, 3), gamma=3,
                                  temperature=0.0, attn_impl="dense"))
    srv = SpecServer(eng, n_slots=2, s_max=96, max_new_cap=32,
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    fe = HttpFrontend(srv, port=0,
                      # toy text codec: space-separated token ids
                      encode=lambda s: [int(x) for x in s.split()],
                      decode=lambda ts: " ".join(str(t) for t in ts))
    with fe:
        yield fe


def _standalone(eng, toks, max_new):
    out = eng.tree_spec_generate(
        np.asarray([toks]), np.asarray([len(toks)], np.int32),
        max_gen_len=max_new, state_dtype=jnp.float32)
    row = out["output_ids"][0]
    stop = {eng.cfg.eos_token_id, *eng.cfg.extra_eos_token_ids}
    keep = []
    for t in row[:max_new]:
        if int(t) in stop:
            break
        keep.append(int(t))
    return keep


def test_single_completion_token_exact(frontend):
    eng = frontend.server.engine
    rng = np.random.default_rng(3)
    toks = rng.integers(2, eng.cfg.vocab_size, (11,)).tolist()
    out = post_json(f"http://127.0.0.1:{frontend.port}/v1/completions",
                    {"prompt": toks, "max_tokens": 12})
    assert out["choices"][0]["token_ids"] == _standalone(eng, toks, 12)
    assert out["usage"]["prompt_tokens"] == 11


def test_concurrent_requests_all_exact(frontend):
    eng = frontend.server.engine
    rng = np.random.default_rng(4)
    prompts = [rng.integers(2, eng.cfg.vocab_size, (l,)).tolist()
               for l in (9, 14, 7, 18, 12)]
    want = [_standalone(eng, p, 10) for p in prompts]
    got = [None] * len(prompts)

    def hit(i):
        out = post_json(f"http://127.0.0.1:{frontend.port}/v1/completions",
                        {"prompt": prompts[i], "max_tokens": 10})
        got[i] = out["choices"][0]["token_ids"]

    ts = [threading.Thread(target=hit, args=(i,)) for i in range(len(prompts))]
    [t.start() for t in ts]
    [t.join(timeout=300) for t in ts]
    assert got == want


def test_completion_client_roundtrip(frontend):
    """The bundled OpenAI-compatible client talks to the frontend (text
    prompts through the toy codec)."""
    c = CompletionClient(
        f"http://127.0.0.1:{frontend.port}/v1/completions",
        max_tokens=8, stop=None)
    eng = frontend.server.engine
    toks = [5, 17, 42, 9]
    want = _standalone(eng, toks, 8)
    assert c("5 17 42 9") == " ".join(str(t) for t in want)


def test_health_and_models(frontend):
    import json, urllib.request
    base = f"http://127.0.0.1:{frontend.port}"
    with urllib.request.urlopen(f"{base}/healthz") as r:
        st = json.loads(r.read())
    assert "tokens_served" in st and st["completions"] >= 1
    with urllib.request.urlopen(f"{base}/v1/models") as r:
        models = json.loads(r.read())
    assert models["data"][0]["id"] == "longspec-tpu"


def test_oversize_prompt_rejected(frontend):
    from longspec_tpu.data.api_client import ApiError
    with pytest.raises(ApiError, match="capacity"):
        post_json(f"http://127.0.0.1:{frontend.port}/v1/completions",
                  {"prompt": list(range(2, 96)), "max_tokens": 32})


def test_serve_cli_args():
    """Arg surface of the serving CLI parses and inherits infer defaults."""
    from longspec_tpu.cli.serve import get_args
    a = get_args(["--target-path", "/t", "--draft-path", "/d",
                  "--n-slots", "2", "--s-max", "4096", "--policy", "sjf"])
    assert a.n_slots == 2 and a.s_max == 4096 and a.policy == "sjf"
    assert a.draft_head == "int8" and a.attn_impl == "chunked"
    assert a.tree_shape == [4, 16, 16, 16, 16] and a.gamma == 4


def test_streaming_sse_token_exact(frontend):
    """stream=true: SSE deltas concatenate to exactly the non-streamed
    completion, final chunk carries usage + finish_reason, then [DONE]."""
    import urllib.request
    eng = frontend.server.engine
    rng = np.random.default_rng(6)
    toks = rng.integers(2, eng.cfg.vocab_size, (10,)).tolist()
    want = _standalone(eng, toks, 14)

    req = urllib.request.Request(
        f"http://127.0.0.1:{frontend.port}/v1/completions",
        data=json.dumps({"prompt": toks, "max_tokens": 14,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            body = line[len("data: "):]
            if body == "[DONE]":
                events.append(None)
                break
            events.append(json.loads(body))
    assert events[-1] is None, "missing [DONE] terminator"
    *deltas, final, _ = events
    assert deltas, "no incremental deltas before the final chunk"
    streamed = [t for d in deltas for t in d["choices"][0]["token_ids"]]
    assert streamed == want
    assert final["choices"][0]["token_ids"] == want
    assert final["usage"]["completion_tokens"] == len(want)
    assert final["choices"][0]["finish_reason"] in ("stop", "length")


@pytest.fixture(scope="module")
def chat_frontend(frontend):
    """Same server, chat template = flatten message contents to token ids."""
    frontend.chat_template = lambda msgs: [
        int(x) for m in msgs for x in str(m["content"]).split()]
    yield frontend
    frontend.chat_template = None


def test_chat_completions_roundtrip(chat_frontend):
    fe = chat_frontend
    eng = fe.server.engine
    toks = [7, 21, 33, 5, 90]
    want = _standalone(eng, toks, 9)
    out = post_json(f"http://127.0.0.1:{fe.port}/v1/chat/completions",
                    {"messages": [{"role": "user",
                                   "content": "7 21 33 5 90"}],
                     "max_tokens": 9})
    assert out["object"] == "chat.completion"
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert out["choices"][0]["token_ids"] == want
    assert msg["content"] == " ".join(str(t) for t in want)
    # the bundled client's chat path parses the same shape
    c = CompletionClient(
        f"http://127.0.0.1:{fe.port}/v1/chat/completions",
        max_tokens=9, stop=None)
    assert c("7 21 33 5 90") == msg["content"]


def test_chat_streaming_chunks(chat_frontend):
    import urllib.request
    fe = chat_frontend
    eng = fe.server.engine
    toks = [11, 4, 87, 13]
    want = _standalone(eng, toks, 8)
    req = urllib.request.Request(
        f"http://127.0.0.1:{fe.port}/v1/chat/completions",
        data=json.dumps({"messages": [{"role": "user",
                                       "content": "11 4 87 13"}],
                         "max_tokens": 8, "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    deltas, final, done = [], None, False
    with urllib.request.urlopen(req, timeout=300) as r:
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            b = line[6:]
            if b == "[DONE]":
                done = True
                break
            o = json.loads(b)
            if o.get("object") == "chat.completion.chunk":
                deltas += o["choices"][0]["token_ids"]
            else:
                final = o
    assert done and deltas == want
    assert final["object"] == "chat.completion"
    assert final["choices"][0]["token_ids"] == want


def test_stop_sequence_trims_and_cancels(frontend):
    """`stop` strings: the decoded output is trimmed at the first match,
    finish_reason becomes "stop", and the request is cancelled server-side
    (the decode budget returns to the batch)."""
    eng = frontend.server.engine
    rng = np.random.default_rng(17)
    toks = rng.integers(2, eng.cfg.vocab_size, (12,)).tolist()
    want = _standalone(eng, toks, 20)
    assert len(want) >= 6, "need enough tokens to stop mid-way"
    full_text = " ".join(str(t) for t in want)
    stop_s = " ".join(str(t) for t in want[3:5])
    cut = full_text.find(stop_s)
    out = post_json(f"http://127.0.0.1:{frontend.port}/v1/completions",
                    {"prompt": toks, "max_tokens": 20, "stop": stop_s})
    assert out["choices"][0]["finish_reason"] == "stop"
    assert out["choices"][0]["text"] == full_text[:cut]


def test_cancel_queued_and_active():
    """SpecServer.cancel: queued requests drop outright; active ones emit
    their tokens-so-far with finish_reason='cancelled'."""
    from longspec_tpu.config import DraftConfig, EngineConfig, tiny_test
    cfg = tiny_test(vocab_size=101, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(2), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(3), cfg)
    eng = SpecEngine(params, dparams, cfg, DraftConfig(window=8),
                     EngineConfig(tree_shape=(2, 3), gamma=2,
                                  attn_impl="dense"))
    srv = SpecServer(eng, n_slots=1, s_max=80, max_new_cap=32,
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    rng = np.random.default_rng(4)
    u1 = srv.submit(rng.integers(2, 101, (9,)).tolist(), 24)
    u2 = srv.submit(rng.integers(2, 101, (7,)).tolist(), 24)
    comps = srv.step(rounds=2)          # admits u1, decodes a little
    assert not comps
    assert srv.cancel(u2)               # still queued -> dropped
    assert srv.cancel(u1)               # active -> finishes next harvest
    assert not srv.cancel(999)          # unknown
    comps = {c.uid: c for c in srv.run(rounds_per_step=2)}
    assert list(comps) == [u1]
    assert comps[u1].finish_reason == "cancelled"
    assert 1 <= len(comps[u1].tokens) < 24


def test_client_disconnect_cancels_stream(frontend):
    """A streaming client that closes its socket mid-stream gets its
    request cancelled server-side instead of decoding to the budget."""
    import socket
    eng = frontend.server.engine
    rng = np.random.default_rng(23)
    toks = rng.integers(2, eng.cfg.vocab_size, (10,)).tolist()
    body = json.dumps({"prompt": toks, "max_tokens": 30,
                       "stream": True}).encode()
    s = socket.create_connection(("127.0.0.1", frontend.port), timeout=60)
    s.sendall(b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
              b"Content-Type: application/json\r\n"
              + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
    s.recv(512)      # headers + first bytes arrive
    s.close()        # walk away mid-stream
    # drain: the server must converge (cancelled) without decoding forever
    import time as _t
    deadline = _t.time() + 120
    while _t.time() < deadline:
        if not frontend.server.active_slots and not frontend.server.pending \
                and not frontend._pending:
            break
        _t.sleep(0.2)
    assert not frontend._pending, "request never cancelled/harvested"


def test_temperature_mismatch_rejected(frontend):
    """Per-request temperature is unsupported (compile-time constant):
    mismatches get an honest 400, matches pass through."""
    from longspec_tpu.data.api_client import ApiError
    toks = [5, 9, 11]
    with pytest.raises(ApiError, match="temperature"):
        post_json(f"http://127.0.0.1:{frontend.port}/v1/completions",
                  {"prompt": toks, "max_tokens": 4, "temperature": 0.7})
    out = post_json(f"http://127.0.0.1:{frontend.port}/v1/completions",
                    {"prompt": toks, "max_tokens": 4, "temperature": 0.0})
    assert len(out["choices"][0]["token_ids"]) >= 1
