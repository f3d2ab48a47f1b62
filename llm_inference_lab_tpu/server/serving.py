"""OpenAI-compatible inference server backed by the continuous batcher.

Endpoints:
  GET  /health                 -> {"status": "ok", ...}
  POST /v1/completions         -> {choices: [{text, ...}], usage: {...}}
  POST /v1/chat/completions    -> {choices: [{message: {...}}], usage: {...}}
  GET  /v1/models              -> model listing

Architecture: HTTP handler threads enqueue requests into a thread-safe
queue and wait on per-request events; ONE engine thread owns the device —
it drains the queue into the ContinuousBatcher, runs decode steps, retires
finished sequences, and signals the waiters. The device never idles while
requests are queued, and admissions ride between steps (continuous
batching), with no cross-thread JAX access.
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine


class _Pending:
    __slots__ = ("prompt", "max_tokens", "event", "result")

    def __init__(self, prompt: str, max_tokens: int):
        self.prompt = prompt
        self.max_tokens = max_tokens
        self.event = threading.Event()
        self.result: Optional[dict] = None


class InferenceServer:
    def __init__(
        self,
        engine: Engine,
        n_slots: int = 8,
        host: str = "127.0.0.1",
        port: int = 8000,
        poll_every: int = 4,
    ):
        self.engine = engine
        self.batcher = ContinuousBatcher(engine, n_slots=n_slots, poll_every=poll_every)
        self.host, self.port = host, port
        self._incoming: "queue.Queue[_Pending]" = queue.Queue()
        self._inflight: Dict[int, _Pending] = {}
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._started_at = time.time()
        self._served = 0

    # ------------------------------------------------------------- engine
    def _engine_loop(self) -> None:
        b = self.batcher
        while not self._stop.is_set():
            # Admit everything waiting.
            drained = False
            while True:
                try:
                    p = self._incoming.get_nowait()
                except queue.Empty:
                    break
                rid = b.submit(p.prompt, max_new_tokens=p.max_tokens)
                self._inflight[rid] = p
                drained = True
            if drained or b.scheduler.pending():
                b._admit_pending()

            if not any(s is not None for s in b._slots):
                # Idle: wait briefly for work.
                try:
                    p = self._incoming.get(timeout=0.05)
                    self._incoming.put(p)
                except queue.Empty:
                    pass
                continue

            b.step_chunk(b.poll_every)
            b._retire_finished()
            b._admit_pending()
            for rid, req in list(b._done.items()):
                pend = self._inflight.pop(rid, None)
                if pend is not None:
                    pend.result = req.result
                    pend.event.set()
                    self._served += 1
                del b._done[rid]

    # --------------------------------------------------------------- http
    def _make_handler(server: "InferenceServer"):
        outer = server

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                pass

            def _json(self, code: int, body: dict) -> None:
                data = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/health":
                    self._json(200, {
                        "status": "ok",
                        "uptime_s": round(time.time() - outer._started_at, 1),
                        "served": outer._served,
                        "model": outer.engine.config.base_model,
                    })
                elif self.path == "/v1/models":
                    self._json(200, {"object": "list", "data": [{
                        "id": outer.engine.config.base_model,
                        "object": "model",
                    }]})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(length) or b"{}")
                except Exception:
                    self._json(400, {"error": "invalid JSON"})
                    return
                if self.path == "/v1/completions":
                    prompt = body.get("prompt", "")
                    if isinstance(prompt, list):
                        prompt = prompt[0] if prompt else ""
                elif self.path == "/v1/chat/completions":
                    msgs = body.get("messages", [])
                    prompt = "\n".join(
                        f"{m.get('role', 'user')}: {m.get('content', '')}"
                        for m in msgs
                    ) + "\nassistant:"
                else:
                    self._json(404, {"error": "not found"})
                    return
                max_tokens = int(
                    body.get("max_tokens")
                    or body.get("max_completion_tokens")
                    or outer.engine.config.max_new_tokens
                )
                pend = _Pending(prompt, max_tokens)
                outer._incoming.put(pend)
                if not pend.event.wait(timeout=600):
                    self._json(504, {"error": "generation timed out"})
                    return
                r = pend.result
                usage = {
                    "prompt_tokens": len(outer.engine.tokenizer.encode(prompt)),
                    "completion_tokens": r["generated_tokens"],
                    "total_tokens": 0,
                }
                usage["total_tokens"] = usage["prompt_tokens"] + usage["completion_tokens"]
                if self.path == "/v1/completions":
                    self._json(200, {
                        "id": f"cmpl-{uuid.uuid4().hex[:12]}",
                        "object": "text_completion",
                        "model": outer.engine.config.base_model,
                        "choices": [{
                            "index": 0, "text": r["text"],
                            "finish_reason": "stop",
                        }],
                        "usage": usage,
                        "specdx": {
                            "acceptance_rate": r["acceptance_rate"],
                            "latency_ms": r["latency_ms"],
                        },
                    })
                else:
                    self._json(200, {
                        "id": f"chatcmpl-{uuid.uuid4().hex[:12]}",
                        "object": "chat.completion",
                        "model": outer.engine.config.base_model,
                        "choices": [{
                            "index": 0,
                            "message": {"role": "assistant", "content": r["text"]},
                            "finish_reason": "stop",
                        }],
                        "usage": usage,
                    })

        return Handler

    # ---------------------------------------------------------- lifecycle
    def start(self, block: bool = False) -> None:
        self._worker = threading.Thread(target=self._engine_loop, daemon=True)
        self._worker.start()
        self._httpd = ThreadingHTTPServer(
            (self.host, self.port), self._make_handler()
        )
        self.port = self._httpd.server_address[1]  # resolve port 0
        self._http_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._http_thread.start()
        if block:
            try:
                while not self._stop.is_set():
                    time.sleep(1)
            except KeyboardInterrupt:
                self.stop()

    def stop(self) -> None:
        self._stop.set()
        if self._httpd is not None:
            self._httpd.shutdown()
        if self._worker is not None:
            self._worker.join(timeout=5)


def main() -> int:  # pragma: no cover - thin CLI
    import argparse

    from llm_inference_lab_tpu.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--base-model", default="gpt2")
    ap.add_argument("--draft-model", default="distilgpt2")
    ap.add_argument("--impl", default="hf")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--slots", type=int, default=8)
    args = ap.parse_args()
    cfg = load_config(args.config, base_model=args.base_model,
                      draft_model=args.draft_model, implementation=args.impl)
    server = InferenceServer(Engine(cfg), n_slots=args.slots, port=args.port)
    print(json.dumps({"serving": f"http://{server.host}:{args.port}"}))
    server.start(block=True)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
