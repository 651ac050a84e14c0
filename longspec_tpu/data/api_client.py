"""HTTP client for OpenAI-compatible completion servers (vLLM, TGI, etc.).

TPU-native equivalent of the reference's eval-time generation client
(`longspec/train/data/vllm.py:11-141`): same endpoint auto-detection
(legacy /generate, /v1/completions, /v1/chat/completions), the same
context-length backoff (shrink max_tokens and retry when the server
reports "maximum context length"), plus thread-pooled batch fan-out.
Stdlib urllib only — no hard dependency on `requests`.
"""
from __future__ import annotations

import json
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Sequence, Union

from ..utils.logging import get_logger

log = get_logger("api_client")


def post_json(url: str, payload: Dict[str, Any], timeout: float = 600.0,
              headers: Optional[Dict[str, str]] = None) -> Dict[str, Any]:
    """POST JSON, return decoded JSON body. Raises `ApiError` on non-200
    with the body text attached (callers inspect it for backoff hints)."""
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json",
                 **(headers or {})}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        raise ApiError(e.code, e.read().decode("utf-8", "replace")) from e
    except (urllib.error.URLError, TimeoutError, OSError) as e:
        # connection refused/reset, DNS, socket timeout — transport-level
        # failures get status 0 so callers' retry loops see them too
        raise ApiError(0, f"transport error: {e}") from e


class ApiError(RuntimeError):
    def __init__(self, status: int, body: str):
        super().__init__(f"HTTP {status}: {body[:200]}")
        self.status = status
        self.body = body


class CompletionClient:
    """Callable prompt -> completion text against an OpenAI-compatible URL.

    Endpoint dispatch matches the reference (`vllm.py:62-141`):
    - url contains "/chat/completions": chat schema, optional system prompt
    - url contains "completions": text-completion schema
    - otherwise: vLLM legacy /generate schema ({"prompt", ...} -> {"text"})
    Retries context-length failures by shrinking max_tokens in steps of 100,
    up to `max_retry` times.
    """

    def __init__(self, api_url: str, n: int = 1, max_tokens: int = 1024,
                 temperature: float = 0.0,
                 stop: Optional[Sequence[str]] = ("</s>",),
                 system_prompt: Optional[str] = None,
                 model: Optional[str] = None, max_retry: int = 10,
                 timeout: float = 600.0, **extra):
        self.api_url = api_url
        self.n = n
        self.max_tokens = max_tokens
        self.temperature = temperature
        self.stop = list(stop) if stop else None
        self.system_prompt = system_prompt
        self.model = model
        self.max_retry = max_retry
        self.timeout = timeout
        self.extra = extra

    def _payload(self, prompt: str, max_tokens: int) -> Dict[str, Any]:
        p: Dict[str, Any] = {"n": self.n, "max_tokens": max_tokens,
                             "temperature": self.temperature, **self.extra}
        if self.stop:
            p["stop"] = self.stop
        if self.model:
            p["model"] = self.model
        if "/chat/completions" in self.api_url:
            msgs = []
            if self.system_prompt:
                msgs.append({"role": "system", "content": self.system_prompt})
            msgs.append({"role": "user", "content": prompt})
            p["messages"] = msgs
        else:
            p["prompt"] = prompt
        return p

    def _extract(self, data: Dict[str, Any], prompt: str
                 ) -> Union[str, List[str]]:
        # servers may echo the prompt as a PREFIX of the completion; strip
        # only that (str.replace would delete every occurrence of the prompt
        # substring anywhere in the output, corrupting legitimate repeats)
        strip = lambda t: t[len(prompt):] if t.startswith(prompt) else t
        if "choices" in data:  # OpenAI-compatible
            if "/chat/completions" in self.api_url:
                outs = [c["message"]["content"] for c in data["choices"]]
            else:
                outs = [strip(c["text"]) for c in data["choices"]]
        else:  # vLLM legacy /generate: {"text": [full_text, ...]}
            text = data["text"]
            outs = [strip(t) for t in
                    (text if isinstance(text, list) else [text])]
        return outs[0] if len(outs) == 1 else outs

    def __call__(self, prompt: str) -> Union[str, List[str]]:
        max_tokens = self.max_tokens
        for attempt in range(self.max_retry + 1):
            try:
                data = post_json(self.api_url,
                                 self._payload(prompt, max_tokens),
                                 timeout=self.timeout)
                return self._extract(data, prompt)
            except ApiError as e:
                if "maximum context length" in e.body and max_tokens > 100:
                    max_tokens -= 100  # ref `vllm.py:96-99` backoff
                    log.warning("context overflow; max_tokens -> %d",
                                max_tokens)
                    continue
                if attempt == self.max_retry:
                    raise
                log.warning("request failed (%s), retry %d/%d",
                            e, attempt + 1, self.max_retry)
        # only reachable when every attempt hit the context-length backoff:
        # surface it rather than record "" as a valid completion
        raise ApiError(0, "context-length backoff exhausted "
                       f"(max_tokens ended at {max_tokens})")

    def map(self, prompts: Sequence[str], num_workers: int = 8
            ) -> List[Union[str, List[str]]]:
        """Fan a batch of prompts over a thread pool, order-preserving."""
        with ThreadPoolExecutor(max_workers=num_workers) as ex:
            return list(ex.map(self, prompts))
