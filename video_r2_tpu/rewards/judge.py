"""Judge LLM client: OpenAI-compatible chat over HTTP (stdlib only).

Parity: reward_funcs.py:9-14 — 10 s timeout chosen there to avoid NCCL
watchdog stalls; here it simply bounds host-callback latency off the mesh.
The client protocol is injectable so tests and offline runs use fakes, and a
co-located engine server (engine/server.py) satisfies it too.
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import Protocol


class JudgeClient(Protocol):
    def chat(self, system: str, user: str) -> str: ...


class OpenAICompatClient:
    def __init__(self, base_url: str | None = None, model: str | None = None,
                 api_key: str | None = None, timeout: float = 10.0):
        self.base_url = (base_url or os.environ.get(
            "OPENAI_API_BASE", "http://localhost:8000/v1")).rstrip("/")
        self.model = model or os.environ.get("SERVED_MODEL")
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "EMPTY")
        self.timeout = timeout

    def chat(self, system: str, user: str) -> str:
        payload = json.dumps({
            "model": self.model,
            "messages": [{"role": "system", "content": system},
                         {"role": "user", "content": user}],
            "stream": False,
        }).encode()
        req = urllib.request.Request(
            f"{self.base_url}/chat/completions", data=payload,
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {self.api_key}"})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            data = json.loads(resp.read())
        return (data["choices"][0]["message"]["content"] or "").strip()


class StaticJudge:
    """Deterministic fake for tests: returns canned responses in order, or a
    constant."""

    def __init__(self, responses):
        self.responses = list(responses) if isinstance(responses, (list, tuple)) \
            else [responses]
        self.calls: list[tuple[str, str]] = []

    def chat(self, system: str, user: str) -> str:
        self.calls.append((system, user))
        idx = min(len(self.calls) - 1, len(self.responses) - 1)
        return self.responses[idx]
