"""OpenAI-compatible HTTP front-end over the continuous-batching server.

The reference ships only a CLIENT for OpenAI-style endpoints
(`longspec/train/data/vllm.py`); its engines have no serving surface at
all. This module closes the loop: `HttpFrontend` exposes `SpecServer`
(slot-based continuous batching over the jitted speculative rounds) as

    POST /v1/completions        {"prompt": str | [int], "max_tokens": N,
                                 "stream": bool, ...}
    POST /v1/chat/completions   {"messages": [{role, content}, ...], ...}
    GET  /v1/models             (id = the configured model name)
    GET  /healthz               SpecServer.stats() + queue state

so `longspec_tpu.data.api_client.CompletionClient` — and any OpenAI SDK —
can talk to it directly.

Threading model (the engine is NOT thread-safe; XLA dispatch must stay on
one thread): HTTP handler threads only enqueue requests and wait on a
per-request event; a single decode thread owns the SpecServer and loops
`step()` while work is pending. Submissions are handed to the decode
thread through a mutex-guarded list, so all engine/jit calls happen on one
thread regardless of HTTP concurrency.
"""
from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional, Sequence, Union

from .server import Completion, SpecServer


class _Pending:
    __slots__ = ("event", "completion", "error", "q", "sent", "stop",
                 "silenced", "uid")

    def __init__(self, stream: bool = False, stop=None):
        self.event = threading.Event()
        self.completion: Optional[Completion] = None
        self.error: Optional[str] = None
        # streaming: the decode thread pushes ("delta", [tok,...]) items,
        # then ("done", Completion) / ("error", msg)
        self.q: Optional[queue.Queue] = queue.Queue() if stream else None
        self.sent = 0         # tokens already streamed
        self.stop = stop      # stop strings: matched -> request cancelled
        self.silenced = False  # stream: stop matched, no further deltas
        self.uid = None       # set by the decode thread at submit


class HttpFrontend:
    """Serve a SpecServer over HTTP.

    `encode`/`decode` adapt between text and token ids (e.g. a HF
    tokenizer's methods). When omitted, prompts must be raw token lists and
    completions are returned as token ids under `choices[0].token_ids`
    (text is empty) — useful for benchmarking without a tokenizer.
    """

    def __init__(self, server: SpecServer, host: str = "127.0.0.1",
                 port: int = 0, model_name: str = "longspec-tpu",
                 encode: Optional[Callable[[str], Sequence[int]]] = None,
                 decode: Optional[Callable[[Sequence[int]], str]] = None,
                 chat_template: Optional[Callable] = None,
                 default_max_tokens: int = 128, idle_sleep_s: float = 0.005):
        self.server = server
        self.model_name = model_name
        self.encode = encode
        self.decode = decode
        # messages -> prompt (str or token list) for /v1/chat/completions;
        # e.g. lambda m: tok.apply_chat_template(m, add_generation_prompt=True)
        self.chat_template = chat_template
        self.default_max_tokens = default_max_tokens
        self.idle_sleep_s = idle_sleep_s
        self._lock = threading.Lock()       # guards _inbox + _pending
        self._inbox: List[tuple] = []       # (tokens, max_new, _Pending)
        self._cancel_inbox: List[_Pending] = []  # disconnected clients
        self._pending: dict = {}            # uid -> _Pending
        self._stop = threading.Event()
        self._decode_thread = threading.Thread(target=self._decode_loop,
                                               daemon=True)
        frontend = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):      # quiet
                pass

            def _reply(self, code: int, obj):
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/healthz":
                    st = frontend.server.stats()
                    st["inbox"] = len(frontend._inbox)
                    self._reply(200, st)
                elif self.path == "/v1/models":
                    self._reply(200, {"object": "list", "data": [
                        {"id": frontend.model_name, "object": "model"}]})
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                chat = self.path in ("/v1/chat/completions",
                                     "/chat/completions")
                if not chat and self.path not in ("/v1/completions",
                                                  "/completions"):
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if chat:
                        prompt = frontend._render_chat(
                            body.get("messages", []))
                    else:
                        prompt = body.get("prompt", "")
                    max_tokens = int(body.get("max_tokens",
                                              frontend.default_max_tokens))
                    stop = body.get("stop")
                    if isinstance(stop, str):
                        stop = [stop]
                    temperature = None
                    if "temperature" in body:
                        temperature = float(body["temperature"])
                        ecfg = frontend.server.engine.ecfg
                        if temperature < 0.0:
                            raise ValueError("temperature must be >= 0")
                        if (not ecfg.per_row_temperature
                                and temperature != ecfg.temperature):
                            # without the traced-temps engine mode,
                            # temperature is a compile-time constant of the
                            # jitted rounds: be honest instead of silently
                            # sampling at the engine's setting
                            raise ValueError(
                                f"this server decodes at temperature "
                                f"{ecfg.temperature} (fixed at engine "
                                f"build); start the engine with "
                                f"per_row_temperature=True for per-request "
                                f"temperature")
                    if body.get("stream"):
                        self._stream(prompt, max_tokens, chat=chat,
                                     stop=stop, temperature=temperature)
                        return
                    out = frontend.complete(prompt, max_tokens=max_tokens,
                                            stop=stop,
                                            temperature=temperature)
                    if chat:
                        out = frontend._to_chat(out)
                except ValueError as e:
                    self._reply(400, {"error": str(e)})
                    return
                self._reply(200, out)

            def _emit_sse(self, obj):
                self.wfile.write(b"data: " + json.dumps(obj).encode()
                                 + b"\n\n")
                self.wfile.flush()

            def _stream(self, prompt, max_tokens, chat=False, stop=None,
                        temperature=None):
                """Server-sent events, OpenAI streaming shape: one `data:`
                chunk per token delta, then a usage-bearing final chunk and
                `data: [DONE]`. Chat mode mirrors chat.completion.chunk
                (delta.content instead of text)."""
                try:
                    p = frontend._enqueue(prompt, max_tokens, stream=True,
                                          stop=stop, temperature=temperature)
                except ValueError as e:
                    self._reply(400, {"error": str(e)})
                    return
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Connection", "close")
                self.end_headers()


                try:
                    self._pump(p, chat)
                except (BrokenPipeError, ConnectionResetError):
                    # client went away mid-stream: stop decoding for them
                    frontend.request_cancel(p)

            def _pump(self, p, chat):
                emit = self._emit_sse
                while True:
                    kind, payload = p.q.get(timeout=600)
                    if kind == "delta":
                        text = (frontend.decode(payload)
                                if frontend.decode else "")
                        if chat:
                            choice = {"index": 0,
                                      "delta": {"content": text},
                                      "token_ids": payload,
                                      "finish_reason": None}
                            obj = "chat.completion.chunk"
                        else:
                            choice = {"index": 0, "text": text,
                                      "token_ids": payload,
                                      "finish_reason": None}
                            obj = "text_completion"
                        emit({"object": obj,
                              "model": frontend.model_name,
                              "choices": [choice]})
                    elif kind == "done":
                        out = frontend._format(payload, stop=p.stop)
                        emit(frontend._to_chat(out) if chat else out)
                        self.wfile.write(b"data: [DONE]\n\n")
                        self.wfile.flush()
                        return
                    else:  # error
                        emit({"error": payload})
                        return

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_port
        self._http_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)

    # ------------------------------------------------------------------

    def start(self):
        self._decode_thread.start()
        self._http_thread.start()
        return self

    def close(self):
        self._stop.set()
        self._httpd.shutdown()
        self._decode_thread.join(timeout=30)

    def wait(self):
        """Block until Ctrl-C, then shut down cleanly."""
        try:
            while not self._stop.is_set():
                time.sleep(60)
        except KeyboardInterrupt:
            self.close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------

    def _enqueue(self, prompt: Union[str, Sequence[int]], max_tokens: int,
                 stream: bool = False, stop=None,
                 temperature: Optional[float] = None) -> _Pending:
        if stop and self.decode is None:
            raise ValueError("stop sequences need a `decode` tokenizer")
        if isinstance(prompt, str):
            if self.encode is None:
                raise ValueError("text prompt needs an `encode` tokenizer; "
                                 "send a token list instead")
            tokens = list(self.encode(prompt))
        else:
            tokens = [int(t) for t in prompt]
        if not tokens:
            raise ValueError("empty prompt")
        p = _Pending(stream=stream, stop=stop)
        with self._lock:
            self._inbox.append((tokens, max_tokens, temperature, p))
        return p

    def _format(self, c: Completion, stop=None) -> dict:
        toks = list(c.tokens)  # server already trims stop tokens + budget
        text = self.decode(toks) if self.decode else ""
        finish = c.finish_reason
        if stop and text:
            cut = min((i for i in (text.find(x) for x in stop) if i >= 0),
                      default=-1)
            if cut >= 0:
                text = text[:cut]
                finish = "stop"
        return {
            "id": f"cmpl-{c.uid}",
            "object": "text_completion",
            "model": self.model_name,
            "choices": [{"index": 0, "text": text, "token_ids": toks,
                         "finish_reason": finish}],
            "usage": {"prompt_tokens": c.prompt_len,
                      "completion_tokens": len(toks),
                      "total_tokens": c.prompt_len + len(toks)},
            "latency_s": round(c.latency_s, 4),
        }

    def _render_chat(self, messages) -> Union[str, Sequence[int]]:
        if not messages:
            raise ValueError("empty messages")
        if self.chat_template is not None:
            return self.chat_template(messages)
        if self.encode is not None:
            # plain fallback template (ChatML-ish); real deployments pass
            # chat_template=tokenizer.apply_chat_template
            lines = [f"{m.get('role', 'user')}: {m.get('content', '')}"
                     for m in messages]
            return "\n".join(lines) + "\nassistant:"
        raise ValueError("chat endpoint needs a chat_template or encode "
                         "tokenizer")

    def _to_chat(self, out: dict) -> dict:
        c = out["choices"][0]
        return {**out, "object": "chat.completion",
                "choices": [{"index": 0,
                             "message": {"role": "assistant",
                                         "content": c["text"]},
                             "token_ids": c["token_ids"],
                             "finish_reason": c["finish_reason"]}]}

    def complete(self, prompt: Union[str, Sequence[int]],
                 max_tokens: int = 128, timeout: float = 600.0,
                 stop=None, temperature: Optional[float] = None) -> dict:
        """Blocking completion (handler threads land here). `stop`: list of
        strings — generation is CANCELLED server-side when one appears in
        the decoded output (budget returned to the batch) and the text is
        trimmed at the match."""
        p = self._enqueue(prompt, max_tokens, stop=stop,
                          temperature=temperature)
        if not p.event.wait(timeout):
            raise TimeoutError(f"completion not ready after {timeout}s")
        if p.error:
            raise ValueError(p.error)
        return self._format(p.completion, stop=p.stop)

    # ------------------------------------------------------------------

    def _decode_loop(self):
        srv = self.server
        while not self._stop.is_set():
            try:
                self._decode_tick(srv)
            except Exception as e:  # noqa: BLE001 — the ONLY decode thread:
                # an engine error (OOM, compile failure) must fail the
                # in-flight requests and keep the thread alive for new ones
                msg = f"decode error: {type(e).__name__}: {e}"
                with self._lock:
                    inbox, self._inbox = self._inbox, []
                pend = list(self._pending.values()) + [p for *_, p in inbox]
                self._pending.clear()
                for p in pend:
                    p.error = msg
                    if p.q is not None:
                        p.q.put(("error", msg))
                    p.event.set()
                time.sleep(0.05)

    def request_cancel(self, p: _Pending):
        """Thread-safe: ask the decode thread to cancel p's request (used
        when a streaming client disconnects)."""
        with self._lock:
            self._cancel_inbox.append(p)

    def _decode_tick(self, srv):
        with self._lock:
            inbox, self._inbox = self._inbox, []
            cancels, self._cancel_inbox = self._cancel_inbox, []
        drop = set()
        for p in cancels:
            p.silenced = True
            if p.uid is not None:
                srv.cancel(p.uid)
            else:
                drop.add(id(p))               # not yet submitted: skip it
        inbox = [x for x in inbox if id(x[3]) not in drop]
        for tokens, max_new, temperature, p in inbox:
            try:
                uid = srv.submit(tokens, max_new, temperature=temperature)
                self._pending[uid] = p
                p.uid = uid
            except ValueError as e:      # over-capacity prompt etc.
                p.error = str(e)
                if p.q is not None:
                    p.q.put(("error", str(e)))
                p.event.set()
        if srv.pending or srv.active_slots:
            # shorter decode segments while a stream is LIVE: delta latency
            # is bounded by rounds-per-step x round time
            any_stream = any(p.q is not None for p in self._pending.values())
            any_stop = any(p.stop for p in self._pending.values())
            finished = srv.step(rounds=4 if any_stream else 16)
            if any_stream or any_stop:
                for uid, toks in srv.partials().items():
                    p = self._pending.get(uid)
                    if p is None:
                        continue
                    if p.stop and not p.silenced:
                        text = self.decode(toks)
                        if any(x in text for x in p.stop):
                            # stop string reached: cancel server-side (the
                            # budget returns to the batch); _format trims
                            # the final text at the match
                            p.silenced = True
                            srv.cancel(uid)
                    if p.q is not None and not p.silenced \
                            and len(toks) > p.sent:
                        p.q.put(("delta", toks[p.sent:]))
                        p.sent = len(toks)
            for c in finished:
                p = self._pending.pop(c.uid, None)
                if p is None:
                    continue
                p.completion = c
                if p.q is not None:
                    if len(c.tokens) > p.sent and not p.silenced:
                        p.q.put(("delta", c.tokens[p.sent:]))
                    p.q.put(("done", c))
                p.event.set()
        else:
            time.sleep(self.idle_sleep_s)


def serve(server: SpecServer, host: str = "127.0.0.1", port: int = 8000,
          **kw) -> HttpFrontend:
    """Start serving and block until Ctrl-C. For embedded use, construct
    HttpFrontend and call .start()."""
    fe = HttpFrontend(server, host=host, port=port, **kw).start()
    fe.wait()
    return fe
