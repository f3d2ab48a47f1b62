"""OpenAI-compatible inference server backed by the continuous batcher.

Endpoints:
  GET  /health                 -> {"status": "ok", ...}
  POST /v1/completions         -> {choices: [{text, ...}], usage: {...}}
  POST /v1/chat/completions    -> {choices: [{message: {...}}], usage: {...}}
  GET  /v1/models              -> model listing

Request features: max_tokens, stop (string or list — host-side match,
truncates the text AND cancels the slot early so it frees for the next
request), stream (SSE "data:" chunks + [DONE], OpenAI chunk schema), echo
(completions), and per-request sampling (temperature/top_k/top_p/min_p plus
repetition_penalty/presence_penalty/frequency_penalty and logit_bias —
device-side, exact under speculative verification) when the engine runs
with per_request_sampling. `n` (up to 16) returns independent completions as
indexed choices — each rides its own batcher slot, sharing prompt KV pages
under prefix caching. finish_reason is "stop" (EOS / stop sequence) or
"length" (token budget). Client disconnects mid-stream cancel the
generation.

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


def _parse_tool_call(text: str, allowed=None):
    """Strict parse of a generated tool call: the text must be exactly
    {"name": <str>, "arguments": <json>} (the shape the tool grammar
    emits); `allowed` restricts the name set. Returns (name, arguments)
    or None."""
    try:
        d = json.loads(text.strip())
    except Exception:
        return None
    if not isinstance(d, dict) or set(d) != {"name", "arguments"}:
        return None
    if allowed is not None and d["name"] not in allowed:
        return None
    return d["name"], d["arguments"]


class _Pending:
    __slots__ = ("prompt", "max_tokens", "event", "result", "stream", "stop",
                 "chunks", "sent_text", "final_text", "finish_reason",
                 "sampling", "created", "add_special_tokens",
                 "response_format", "lora", "tool_stream")

    def __init__(self, prompt: str, max_tokens: int,
                 stream: bool = False, stop=None, sampling=None,
                 add_special_tokens: bool = True,
                 response_format=None, lora=None,
                 tool_stream: bool = False):
        self.prompt = prompt
        self.max_tokens = max_tokens
        # (temperature, top_k, top_p, min_p, repetition_penalty,
        # presence_penalty, frequency_penalty, logit_bias dict, seed) —
        # Nones mean engine defaults; only honored under
        # per_request_sampling.
        self.sampling = sampling or (None,) * 9
        self.event = threading.Event()
        self.result: Optional[dict] = None
        self.stream = stream
        self.stop = stop or []  # stop sequences (host-side match + truncate)
        self.chunks: "queue.Queue[Optional[str]]" = queue.Queue()  # SSE deltas
        self.sent_text = ""  # decoded text already emitted / observed
        self.final_text: Optional[str] = None  # stop-truncated final text
        self.finish_reason: Optional[str] = None
        self.created = time.time()
        self.add_special_tokens = add_special_tokens
        self.response_format = response_format
        self.lora = lora  # adapter name (OpenAI `model` routing)
        # Streaming a CONSTRAINED tool call: deltas are emitted as OpenAI
        # tool_calls chunks (name once, then argument deltas) instead of
        # content chunks.
        self.tool_stream = tool_stream


class InferenceServer:
    def __init__(
        self,
        engine: Engine,
        n_slots: int = 8,
        host: str = "127.0.0.1",
        port: int = 8000,
        poll_every: int = 8,
        request_timeout: Optional[float] = None,
    ):
        # request_timeout: server-side wall-clock bound per request
        # (seconds); exceeded requests are cancelled and their slot freed
        # immediately (finish_reason "cancelled"). None = unbounded.
        self.engine = engine
        self.batcher = ContinuousBatcher(engine, n_slots=n_slots, poll_every=poll_every)
        self.host, self.port = host, port
        self._incoming: "queue.Queue[_Pending]" = queue.Queue()
        # Embedding jobs ([texts, pooling, event, result-holder]): drained
        # by the engine thread (single device owner) between decode steps.
        self._embed_jobs: "queue.Queue[list]" = queue.Queue()
        # Cancels cross from HTTP handler threads to the engine thread here:
        # only the engine thread may touch JAX state (batcher.cancel writes
        # the device-side active flags).
        self._cancels: "queue.Queue[_Pending]" = queue.Queue()
        self._inflight: Dict[int, _Pending] = {}
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._started_at = time.time()
        self._served = 0
        self.request_timeout = request_timeout
        # Engine-loop section attribution (ms): where a serving cycle's
        # host wall goes outside the batcher's own counters — the
        # decomposition of the HTTP-vs-direct-drive gap (exposed in
        # /stats as loop_ms).
        self.loop_ms: Dict[str, float] = {
            "submit": 0.0, "decode_poll": 0.0, "admit": 0.0,
            "cancel_scan": 0.0, "streams": 0.0, "finalize": 0.0,
        }

    # ------------------------------------------------------------- engine
    def _engine_loop(self) -> None:
        b = self.batcher
        while not self._stop.is_set():
            # Embedding jobs first: prefill-shaped forwards, cheap and
            # latency-sensitive (they don't occupy batcher slots).
            while True:
                try:
                    job = self._embed_jobs.get_nowait()
                except queue.Empty:
                    break
                texts, pooling, event = job[0], job[1], job[2]
                try:
                    job[3] = self.engine.embed(texts, pooling=pooling)
                except Exception as e:  # surface to the handler thread
                    job[4] = str(e)
                event.set()
            # Admit everything waiting.
            lm = self.loop_ms
            t_sec = time.perf_counter()
            drained = False
            while True:
                try:
                    p = self._incoming.get_nowait()
                except queue.Empty:
                    break
                t, k, tp, mp, rp, pp, fp, lb, sd = p.sampling
                rid = b.submit(p.prompt, max_new_tokens=p.max_tokens,
                               temperature=t, top_k=k, top_p=tp, min_p=mp,
                               repetition_penalty=rp, presence_penalty=pp,
                               frequency_penalty=fp, logit_bias=lb,
                               add_special_tokens=p.add_special_tokens,
                               seed=sd,
                               response_format=p.response_format,
                               lora=p.lora)
                self._inflight[rid] = p
                drained = True
            lm["submit"] += (time.perf_counter() - t_sec) * 1e3
            if (drained or b.scheduler.pending()) and not any(
                s is not None for s in b._slots
            ):
                # Nothing decoding: admit eagerly. Otherwise arrivals are
                # admitted at the post-poll point below, batched into one
                # packed group dispatch per cycle.
                b._admit_pending()

            if not any(s is not None for s in b._slots):
                # Idle: wait briefly for work.
                try:
                    p = self._incoming.get(timeout=0.05)
                    self._incoming.put(p)
                except queue.Empty:
                    pass
                continue

            # Pipelined poll: flags snapshot transfers while the chunk runs.
            # n=None: exact-retirement chunk scheduling ends the chunk at
            # the earliest guaranteed lane retirement.
            t_sec = time.perf_counter()
            flags = b.poll_flags_async()
            b.step_chunk()
            b._admit_overlapped()
            fresh = b._prefetch_retire(flags)
            b._retire_finished(fresh if fresh is not None else flags)
            t2 = time.perf_counter()
            lm["decode_poll"] += (t2 - t_sec) * 1e3
            b._admit_post_poll()
            t3 = time.perf_counter()
            lm["admit"] += (t3 - t2) * 1e3
            while True:  # client-disconnect cancels from handler threads
                try:
                    gone = self._cancels.get_nowait()
                except queue.Empty:
                    break
                for rid, p in list(self._inflight.items()):
                    if p is gone:
                        b.cancel(rid)
                        break
            if self.request_timeout is not None:
                now = time.time()
                for rid, p in list(self._inflight.items()):
                    if p.result is None and now - p.created > self.request_timeout:
                        b.cancel(rid)
            t4 = time.perf_counter()
            lm["cancel_scan"] += (t4 - t3) * 1e3
            self._observe_streams()
            t5 = time.perf_counter()
            lm["streams"] += (t5 - t4) * 1e3
            for rid, req in list(b._done.items()):
                pend = self._inflight.pop(rid, None)
                if pend is not None:
                    pend.result = req.result
                    self._finalize(pend)
                    self._served += 1
                del b._done[rid]
            lm["finalize"] += (time.perf_counter() - t5) * 1e3

    def _decode(self, ids) -> str:
        eos = self.engine.eos_token_id
        return self.engine.tokenizer.decode([t for t in ids if t != eos])

    def _match_stop(self, pend: _Pending, text: str) -> int:
        """Index of the earliest stop-sequence match in `text`, or -1."""
        hits = [text.find(s) for s in pend.stop if s and s in text]
        return min(hits) if hits else -1

    def _observe_streams(self) -> None:
        """Per-poll token observation for in-flight streaming / stop-sequence
        requests: ONE extra device fetch (skipped entirely when no such
        request is running), decode-full-then-diff deltas (robust to
        multi-byte tokenizer merges), host-side stop matching with early
        slot cancellation."""
        watch = {
            rid: p for rid, p in self._inflight.items()
            if (p.stream or p.stop) and p.final_text is None
        }
        if not watch:
            return
        gen = self.batcher.poll_generated()
        for rid, pend in watch.items():
            if rid not in gen:
                continue  # already retired; _finalize handles the tail
            text = self._decode(gen[rid])
            cut = self._match_stop(pend, text)
            if cut >= 0:
                pend.final_text = text[:cut]
                pend.finish_reason = "stop"
                self.batcher.cancel(rid)  # free the slot now
                text = pend.final_text
            if pend.stream and len(text) > len(pend.sent_text):
                pend.chunks.put(text[len(pend.sent_text):])
            if len(text) > len(pend.sent_text) or cut >= 0:
                pend.sent_text = text

    def _finalize(self, pend: _Pending) -> None:
        """Resolve final text/finish_reason from the batcher result (plus any
        host-side stop truncation), flush the last stream delta, wake the
        handler thread."""
        r = pend.result
        if pend.final_text is None:
            text = r["text"]
            cut = self._match_stop(pend, text)
            if cut >= 0:
                text = text[:cut]
                pend.finish_reason = "stop"
            pend.final_text = text
        if pend.finish_reason is None:
            pend.finish_reason = r.get("finish_reason", "stop")
        if pend.stream:
            if len(pend.final_text) > len(pend.sent_text):
                pend.chunks.put(pend.final_text[len(pend.sent_text):])
            pend.chunks.put(None)  # sentinel: stream complete
        pend.event.set()

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
                elif self.path == "/stats":
                    self._json(200, {
                        "served": outer._served,
                        "loop_ms": {
                            k: round(v, 1)
                            for k, v in outer.loop_ms.items()
                        },
                        "batcher": outer.batcher.stats.report(
                            outer.batcher.n_slots
                        ),
                    })
                elif self.path == "/v1/models":
                    # Base model + every loaded LoRA adapter (vLLM-style:
                    # adapters are addressable via the `model` field).
                    self._json(200, {"object": "list", "data": [{
                        "id": outer.engine.config.base_model,
                        "object": "model",
                    }] + [{
                        "id": name, "object": "model",
                        "parent": outer.engine.config.base_model,
                    } for name in sorted(
                        getattr(outer.engine, "lora_names", {})
                    )]})
                elif self.path == "/metrics":
                    b = outer.batcher
                    occupied = sum(1 for s in b._slots if s is not None)
                    lines = [
                        "# TYPE specdx_requests_served_total counter",
                        f"specdx_requests_served_total {outer._served}",
                        "# TYPE specdx_uptime_seconds gauge",
                        f"specdx_uptime_seconds "
                        f"{time.time() - outer._started_at:.1f}",
                        "# TYPE specdx_slots_occupied gauge",
                        f"specdx_slots_occupied {occupied}",
                        "# TYPE specdx_slots_total gauge",
                        f"specdx_slots_total {b.n_slots}",
                        "# TYPE specdx_queue_pending gauge",
                        f"specdx_queue_pending {b.scheduler.pending()}",
                        "# TYPE specdx_draft_k gauge",
                        f"specdx_draft_k {b.scheduler.k}",
                    ]
                    if b.paged:
                        lines += [
                            "# TYPE specdx_kv_pages_free gauge",
                            f"specdx_kv_pages_free {b.allocator.free_pages}",
                        ]
                    if getattr(b, "prefix_caching", False):
                        lines += [
                            "# TYPE specdx_prefix_cache_page_hits_total counter",
                            f"specdx_prefix_cache_page_hits_total {b.allocator.hits}",
                            "# TYPE specdx_prefix_cache_page_misses_total counter",
                            f"specdx_prefix_cache_page_misses_total {b.allocator.misses}",
                            "# TYPE specdx_prefix_cache_resident_pages gauge",
                            f"specdx_prefix_cache_resident_pages {b.allocator.reclaimable_pages}",
                        ]
                    data = ("\n".join(lines) + "\n").encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(length) or b"{}")
                except Exception:
                    self._json(400, {"error": "invalid JSON"})
                    return
                templated = False  # chat-template output carries its own BOS
                if self.path == "/v1/embeddings":
                    self._embeddings(body)
                    return
                tools_req = None
                if self.path == "/v1/completions":
                    prompt = body.get("prompt", "")
                    if isinstance(prompt, list):
                        prompt = prompt[0] if prompt else ""
                elif self.path == "/v1/chat/completions":
                    msgs = body.get("messages", [])
                    tools_req = body.get("tools") or None
                    # Prefer the model's own chat template when the loaded
                    # tokenizer ships one (HF apply_chat_template); fall
                    # back to a plain role-prefix transcript otherwise
                    # (ByteTokenizer / templateless models). Tool
                    # definitions render through the template's `tools`
                    # support when it has one.
                    tok = outer.engine.tokenizer
                    tmpl = getattr(tok, "apply_chat_template", None)
                    templated = False
                    if tmpl is not None and getattr(tok, "chat_template", None):
                        try:
                            prompt = tmpl(
                                msgs, tokenize=False,
                                add_generation_prompt=True,
                                **({"tools": tools_req} if tools_req else {}),
                            )
                        except TypeError:  # template lib without tools kwarg
                            prompt = tmpl(
                                msgs, tokenize=False,
                                add_generation_prompt=True,
                            )
                        # The rendered string already contains BOS etc. —
                        # submit must not re-add special tokens.
                        templated = True
                    else:
                        lines = []
                        if tools_req:
                            lines.append(
                                "available tools: " + json.dumps(tools_req)
                            )
                        for m in msgs:
                            role = m.get("role", "user")
                            content = m.get("content", "")
                            if role == "assistant" and m.get("tool_calls"):
                                content = json.dumps(m["tool_calls"])
                            lines.append(f"{role}: {content}")
                        prompt = "\n".join(lines) + "\nassistant:"
                else:
                    self._json(404, {"error": "not found"})
                    return
                max_tokens = int(
                    body.get("max_tokens")
                    or body.get("max_completion_tokens")
                    or outer.engine.config.max_new_tokens
                )
                stop = body.get("stop") or []
                if isinstance(stop, str):
                    stop = [stop]
                stream = bool(body.get("stream", False))
                stream_usage = bool(
                    (body.get("stream_options") or {}).get("include_usage")
                ) if isinstance(body.get("stream_options"), dict) else False
                chat = self.path == "/v1/chat/completions"
                sampling = None
                if outer.engine.config.per_request_sampling:
                    t = body.get("temperature")
                    sampling = (
                        None if t is None else float(t),
                        None if body.get("top_k") is None else int(body["top_k"]),
                        None if body.get("top_p") is None else float(body["top_p"]),
                        None if body.get("min_p") is None else float(body["min_p"]),
                        None if body.get("repetition_penalty") is None
                        else float(body["repetition_penalty"]),
                        None if body.get("presence_penalty") is None
                        else float(body["presence_penalty"]),
                        None if body.get("frequency_penalty") is None
                        else float(body["frequency_penalty"]),
                        None if body.get("logit_bias") is None
                        else {int(k): float(v)
                              for k, v in body["logit_bias"].items()},
                        None if body.get("seed") is None
                        else int(body["seed"]),
                    )
                # OpenAI `model` routing (multi-LoRA): an adapter name
                # selects that adapter; the base model's name (or absent)
                # selects the base; anything else is a 404-style error.
                lora_name = None
                model_req = body.get("model")
                if model_req and model_req != outer.engine.config.base_model:
                    if model_req in getattr(outer.engine, "lora_names", {}):
                        lora_name = model_req
                    else:
                        self._json(404, {
                            "error": f"model {model_req!r} not found "
                                     "(base or a loaded LoRA adapter)"})
                        return
                # OpenAI response_format: {"type": "json_object"} (or
                # "json" for any top-level value). Needs an engine built
                # with EngineConfig(constrain=...).
                rf = body.get("response_format") or {}
                if body.get("guided_regex") and not rf:
                    # vLLM-style guided_regex body key.
                    rf = {"type": "regex", "pattern": body["guided_regex"]}
                rf_type = rf.get("type") if isinstance(rf, dict) else rf
                if rf_type in (None, "text"):
                    rf_type = None
                elif rf_type == "regex":
                    avail_rx = getattr(outer.engine, "_fsm_initial_map", None)
                    if not avail_rx or "regex" not in avail_rx:
                        self._json(400, {
                            "error": "this server's grammar cannot serve "
                                     "regex (start with EngineConfig("
                                     "constrain='regex', "
                                     "constrain_regex=...))"})
                        return
                    # One precompiled pattern per deployment — reject
                    # mismatches rather than silently constraining to a
                    # different language (json_schema precedent).
                    pat = rf.get("pattern") if isinstance(rf, dict) else None
                    if (pat is not None
                            and pat != outer.engine.config.constrain_regex):
                        self._json(400, {
                            "error": "request pattern does not match the "
                                     "pattern this server was compiled "
                                     "with"})
                        return
                elif rf_type in ("json", "json_object", "json_schema"):
                    fmt_map = getattr(outer.engine, "_fsm_initial_map", None)
                    if (getattr(outer.engine, "_constrain_tbl", None) is None
                            or rf_type not in fmt_map):
                        self._json(400, {
                            "error": "this server's grammar cannot serve "
                                     f"response_format {rf_type!r} (started "
                                     "with EngineConfig.constrain="
                                     f"{outer.engine.config.constrain!r})"})
                        return
                    if rf_type == "json_schema":
                        # OpenAI structured outputs carry the schema in the
                        # request; this deployment serves ONE precompiled
                        # schema — reject mismatches rather than silently
                        # constraining to a different shape.
                        req_schema = (rf.get("json_schema") or {}).get(
                            "schema"
                        ) if isinstance(rf, dict) else None
                        if (req_schema is not None
                                and req_schema
                                != outer.engine.config.constrain_schema):
                            self._json(400, {
                                "error": "request schema does not match "
                                         "the schema this server was "
                                         "compiled with"})
                            return
                else:
                    self._json(400, {
                        "error": f"unsupported response_format {rf_type!r}"})
                    return
                # OpenAI tool calling (chat): tool_choice "required" / a
                # named function constrains decode with the engine's
                # precompiled tool grammar (EngineConfig(tools=...));
                # "auto" generates unconstrained (tools rendered into the
                # prompt) and parses a tool call from the output if one
                # was emitted; "none" disables calling.
                tool_parse = None
                tool_names = []
                if tools_req:
                    try:
                        tool_names = [
                            (t.get("function", t) or {}).get("name")
                            for t in tools_req
                        ]
                    except AttributeError:
                        self._json(400, {"error": "malformed tools list"})
                        return
                    choice = body.get("tool_choice", "auto")
                    avail = getattr(outer.engine, "_fsm_initial_map", None) \
                        if outer.engine.config.tools else None
                    if choice in (None, "none"):
                        pass
                    elif choice == "auto":
                        tool_parse = "auto"
                    elif choice == "required":
                        compiled = {
                            k.split(":", 1)[1]
                            for k in (avail or {}) if ":" in k
                        }
                        if not compiled or not compiled <= set(tool_names):
                            self._json(400, {
                                "error": "tool_choice 'required' needs the "
                                "server started with EngineConfig(tools=...) "
                                "whose tools the request's list covers "
                                f"(compiled: {sorted(compiled)})"})
                            return
                        rf_type, tool_parse = "tool_call", "force"
                    elif (isinstance(choice, dict)
                          and choice.get("type") == "function"):
                        name = (choice.get("function") or {}).get("name")
                        if not avail or f"tool_call:{name}" not in avail:
                            self._json(400, {
                                "error": f"tool {name!r} is not compiled "
                                "into this server's tool grammar"})
                            return
                        rf_type, tool_parse = f"tool_call:{name}", "force"
                    else:
                        self._json(400, {
                            "error": f"unsupported tool_choice {choice!r}"})
                        return

                n = max(1, min(int(body.get("n") or 1), 16))
                if n > 1 and stream:
                    self._json(400, {"error": "n > 1 with stream is not supported"})
                    return
                # OpenAI best_of (completions only): generate best_of
                # candidates server-side, return the n highest-mean-logprob
                # ones. Usage counts ALL candidates (OpenAI semantics).
                best_of = max(n, min(int(body.get("best_of") or n), 16))
                if chat:
                    best_of = n
                if stream and best_of != n:
                    self._json(400, {
                        "error": "best_of != n is not supported with stream"})
                    return
                pend = _Pending(prompt, max_tokens, stream=stream, stop=stop,
                                sampling=sampling,
                                add_special_tokens=not templated,
                                response_format=rf_type, lora=lora_name,
                                tool_stream=(stream and tool_parse == "force"))
                # OpenAI `n`: independent completions of the same prompt —
                # each rides its own batcher slot (they share the prompt's
                # KV pages under prefix caching).
                def _cand_sampling(i):
                    # n/best_of candidates must differ: an explicit seed
                    # is perturbed per candidate index (choice 0 keeps the
                    # exact request seed), else all candidates would be
                    # byte-identical under per-request seed streams.
                    if not sampling or sampling[-1] is None:
                        return sampling
                    return sampling[:-1] + (
                        (sampling[-1] ^ (0x9E3779B1 * i)) & 0x7FFFFFFF,
                    )

                extra = [
                    _Pending(prompt, max_tokens, stop=stop,
                             sampling=_cand_sampling(i + 1),
                             add_special_tokens=not templated,
                             response_format=rf_type, lora=lora_name)
                    for i in range(best_of - 1)
                ]
                outer._incoming.put(pend)
                for p in extra:
                    outer._incoming.put(p)
                if stream:
                    self._stream_response(pend, chat,
                                          usage=stream_usage and prompt)
                    return
                for p in [pend] + extra:
                    if not p.event.wait(timeout=600):
                        self._json(504, {"error": "generation timed out"})
                        return
                cands = [pend] + extra
                if best_of > n:
                    def _mean_lp(p):
                        lps = p.result.get("token_logprobs") or []
                        return sum(lps) / max(len(lps), 1)

                    ranked = sorted(cands, key=_mean_lp, reverse=True)
                    cands = ranked[:n]
                r = cands[0].result
                text = (cands[0].final_text
                        if cands[0].final_text is not None else r["text"])
                if body.get("echo") and not chat:
                    text = prompt + text
                usage = {
                    "prompt_tokens": len(outer.engine.tokenizer.encode(prompt)),
                    "completion_tokens": sum(
                        p.result["generated_tokens"] for p in [pend] + extra
                    ),
                    "total_tokens": 0,
                }
                usage["total_tokens"] = usage["prompt_tokens"] + usage["completion_tokens"]

                def lp_of(res):
                    # OpenAI: completions logprobs is an int (0 = token
                    # logprobs with no alternatives — still on); chat's is
                    # a bool. Only null/false/absent disables.
                    lpq = body.get("logprobs")
                    if lpq is None or lpq is False or not res.get(
                        "token_logprobs"
                    ):
                        return None
                    dec = outer.engine.tokenizer.decode
                    toks = [dec([t]) for t in res["generated_ids"]]
                    # Top-N alternatives ride along when the engine captures
                    # them (EngineConfig(logprobs_topk=N)); the chat
                    # `top_logprobs` count (and the completions int) trim
                    # the captured N down per request.
                    tops = res.get("top_logprobs")
                    want_n = body.get("top_logprobs")
                    if want_n is None and chat is False and isinstance(
                        lpq, int
                    ) and not isinstance(lpq, bool):
                        want_n = lpq
                    if tops and want_n is not None:
                        want_n = max(0, int(want_n))
                        tops = [pos[:want_n] for pos in tops]
                        if want_n == 0:
                            tops = None

                    def fmt_pos(pos):
                        # The legacy completions format keys by decoded
                        # text; distinct ids can decode identically — keep
                        # the most likely one instead of last-write-wins.
                        d: Dict[str, float] = {}
                        for alt in pos:
                            key = dec([alt["id"]])
                            if key not in d or alt["logprob"] > d[key]:
                                d[key] = alt["logprob"]
                        return d

                    top_fmt = [fmt_pos(pos) for pos in tops] if tops else None
                    if not chat and body.get("echo"):
                        # OpenAI echo+logprobs: the arrays cover the
                        # prompt too (first entry null; prefix-cached
                        # positions null as well — never re-forwarded).
                        p_ids = outer.engine.tokenizer.encode(prompt)
                        p_lps = res.get("prompt_logprobs") or [None] * len(
                            p_ids
                        )
                        toks = [dec([t]) for t in p_ids] + toks
                        lps = list(p_lps[: len(p_ids)]) + list(
                            res["token_logprobs"]
                        )
                        return {
                            "tokens": toks,
                            "token_logprobs": lps,
                            "top_logprobs": (
                                [None] * len(p_ids) + top_fmt
                                if top_fmt else None
                            ),
                            "text_offset": [],
                        }
                    if chat:
                        return {"content": [
                            {
                                "token": t,
                                "logprob": lp,
                                **(
                                    {"top_logprobs": [
                                        {"token": dec([alt["id"]]),
                                         "logprob": alt["logprob"]}
                                        for alt in tops[i]
                                    ]}
                                    if tops
                                    else {}
                                ),
                            }
                            for i, (t, lp) in enumerate(
                                zip(toks, res["token_logprobs"])
                            )
                        ]}
                    return {
                        "tokens": toks,
                        "token_logprobs": res["token_logprobs"],
                        "top_logprobs": top_fmt,
                        "text_offset": [],
                    }

                def text_of(p, i):
                    if i == 0:
                        return text  # echo-adjusted above
                    t = (
                        p.final_text
                        if p.final_text is not None
                        else p.result["text"]
                    )
                    # OpenAI echo applies to EVERY choice, not just index 0.
                    if body.get("echo") and not chat:
                        t = prompt + t
                    return t

                if not chat:
                    self._json(200, {
                        "id": f"cmpl-{uuid.uuid4().hex[:12]}",
                        "object": "text_completion",
                        "model": outer.engine.config.base_model,
                        "choices": [{
                            "index": i, "text": text_of(p, i),
                            "finish_reason": p.finish_reason,
                            "logprobs": lp_of(p.result),
                        } for i, p in enumerate(cands)],
                        "usage": usage,
                        "specdx": {
                            "acceptance_rate": r["acceptance_rate"],
                            "latency_ms": r["latency_ms"],
                        },
                    })
                else:
                    choices = []
                    for i, p in enumerate(cands):
                        text = text_of(p, i)
                        finish = p.finish_reason
                        message: Dict[str, Any] = {
                            "role": "assistant", "content": text,
                        }
                        if tool_parse:
                            # Forced mode: the grammar guarantees the shape
                            # unless the token budget truncated mid-call
                            # (then the parse fails and the raw text +
                            # "length" pass through). Auto mode: a parse
                            # hit means the model chose to call.
                            tc = _parse_tool_call(text, allowed=tool_names)
                            if tc is not None:
                                message = {
                                    "role": "assistant", "content": None,
                                    "tool_calls": [{
                                        "id": f"call_{uuid.uuid4().hex[:24]}",
                                        "type": "function",
                                        "function": {
                                            "name": tc[0],
                                            "arguments": json.dumps(tc[1]),
                                        },
                                    }],
                                }
                                finish = "tool_calls"
                        choices.append({
                            "index": i, "message": message,
                            "finish_reason": finish,
                            "logprobs": lp_of(p.result),
                        })
                    self._json(200, {
                        "id": f"chatcmpl-{uuid.uuid4().hex[:12]}",
                        "object": "chat.completion",
                        "model": outer.engine.config.base_model,
                        "choices": choices,
                        "usage": usage,
                    })

            def _embeddings(self, body: dict) -> None:
                """OpenAI /v1/embeddings: mean-pooled (default; `pooling`
                accepts "last") normalized final hidden states of the
                target model. encoding_format "float" (default) or
                "base64" (little-endian float32, OpenAI convention). The
                forward runs on the engine thread between decode steps."""
                inp = body.get("input", "")
                texts = (
                    [inp] if isinstance(inp, str)
                    else list(inp) if isinstance(inp, (list, tuple))
                    else None
                )
                if not texts or not all(isinstance(t, str) for t in texts):
                    self._json(400, {
                        "error": "input must be a string or list of strings"})
                    return
                if len(texts) > 64:
                    self._json(400, {"error": "at most 64 inputs"})
                    return
                fmt = body.get("encoding_format", "float")
                if fmt not in ("float", "base64"):
                    self._json(400, {
                        "error": f"unsupported encoding_format {fmt!r}"})
                    return
                pooling = body.get("pooling", "mean")
                if pooling not in ("mean", "last"):
                    self._json(400, {
                        "error": f"unsupported pooling {pooling!r}"})
                    return
                job = [texts, pooling, threading.Event(), None, None]
                outer._embed_jobs.put(job)
                if not job[2].wait(timeout=300):
                    self._json(504, {"error": "embedding timed out"})
                    return
                if job[4] is not None:
                    self._json(400, {"error": job[4]})
                    return
                emb, n_tok = job[3]

                def enc(row):
                    if fmt == "base64":
                        import base64

                        return base64.b64encode(
                            row.astype("<f4").tobytes()
                        ).decode()
                    return [float(x) for x in row]

                self._json(200, {
                    "object": "list",
                    "model": outer.engine.config.base_model,
                    "data": [{
                        "object": "embedding", "index": i,
                        "embedding": enc(emb[i]),
                    } for i in range(emb.shape[0])],
                    "usage": {"prompt_tokens": n_tok,
                              "total_tokens": n_tok},
                })

            def _stream_response(self, pend: _Pending, chat: bool,
                                 usage=None) -> None:
                """OpenAI-style server-sent events: one `data: {json}` chunk
                per observed delta, then a finish_reason chunk and
                `data: [DONE]`."""
                rid = f"{'chatcmpl' if chat else 'cmpl'}-{uuid.uuid4().hex[:12]}"
                model = outer.engine.config.base_model
                obj = "chat.completion.chunk" if chat else "text_completion"
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()

                def emit(delta: Optional[str], finish: Optional[str]) -> None:
                    if chat:
                        choice = {"index": 0,
                                  "delta": {} if delta is None else {"content": delta},
                                  "finish_reason": finish}
                    else:
                        choice = {"index": 0, "text": delta or "",
                                  "finish_reason": finish}
                    payload = {"id": rid, "object": obj, "model": model,
                               "choices": [choice]}
                    self.wfile.write(f"data: {json.dumps(payload)}\n\n".encode())
                    self.wfile.flush()

                def emit_tool(delta: dict, finish: Optional[str]) -> None:
                    payload = {"id": rid, "object": obj, "model": model,
                               "choices": [{"index": 0, "delta": delta,
                                            "finish_reason": finish}]}
                    self.wfile.write(
                        f"data: {json.dumps(payload)}\n\n".encode())
                    self.wfile.flush()

                # Constrained tool-call streaming: the grammar guarantees
                # the text is `{"name":<json-string>,"arguments":` + args
                # + `}` — emit the OpenAI tool_calls chunk shape (name
                # once, then raw argument-byte deltas). One trailing char
                # is held back while streaming: the final `}` belongs to
                # the WRAPPER, not the arguments, and only the finish
                # (which knows whether the call completed or hit the
                # budget) can tell.
                tool_full = ""
                tool_args_at = -1  # index where the arguments value starts
                tool_emitted = 0   # argument chars already emitted
                call_id = f"call_{uuid.uuid4().hex[:24]}"

                def tool_feed(chunk: Optional[str]) -> None:
                    nonlocal tool_full, tool_args_at, tool_emitted
                    if chunk is not None:
                        tool_full += chunk
                    if tool_args_at < 0:
                        marker = ',"arguments":'
                        try:
                            name, after = json.JSONDecoder().raw_decode(
                                tool_full, 8
                            )
                        except (ValueError, IndexError):
                            name = None
                        if name is not None and tool_full.startswith(
                            marker, after
                        ):
                            tool_args_at = after + len(marker)
                            emit_tool({"tool_calls": [{
                                "index": 0, "id": call_id,
                                "type": "function",
                                "function": {"name": name,
                                             "arguments": ""},
                            }]}, None)
                        elif chunk is None:  # budget died inside the name
                            emit_tool({}, pend.finish_reason or "length")
                            return
                        else:
                            return  # name still incomplete
                    if chunk is None:  # finish: flush minus the wrapper }
                        args = tool_full[tool_args_at:]
                        done = _parse_tool_call(tool_full) is not None
                        if done and args.endswith("}"):
                            args = args[:-1]
                        delta = args[tool_emitted:]
                        fin = ("tool_calls" if done
                               else pend.finish_reason or "length")
                        tool_emitted = len(args)
                        emit_tool({"tool_calls": [{
                            "index": 0,
                            "function": {"arguments": delta},
                        }]} if delta else {}, fin)
                        return
                    avail = len(tool_full) - tool_args_at - 1  # hold 1 back
                    if avail > tool_emitted:
                        delta = tool_full[
                            tool_args_at + tool_emitted:tool_args_at + avail
                        ]
                        tool_emitted = avail
                        emit_tool({"tool_calls": [{
                            "index": 0, "function": {"arguments": delta},
                        }]}, None)

                deadline = time.time() + 600
                try:
                    if chat:  # role preamble chunk (OpenAI convention)
                        emit_first = {"id": rid, "object": obj, "model": model,
                                      "choices": [{"index": 0,
                                                   "delta": {"role": "assistant"},
                                                   "finish_reason": None}]}
                        self.wfile.write(
                            f"data: {json.dumps(emit_first)}\n\n".encode())
                        self.wfile.flush()
                    while True:
                        try:
                            chunk = pend.chunks.get(timeout=1.0)
                        except queue.Empty:
                            if time.time() > deadline:
                                break
                            continue
                        if chunk is None:
                            if pend.tool_stream:
                                tool_feed(None)
                            else:
                                emit(None, pend.finish_reason or "stop")
                            if usage:
                                # OpenAI stream_options.include_usage: one
                                # final chunk with empty choices + usage.
                                tok = outer.engine.tokenizer
                                np_ = len(tok.encode(usage))
                                nc = (pend.result or {}).get(
                                    "generated_tokens", 0)
                                self.wfile.write((
                                    "data: " + json.dumps({
                                        "id": rid, "object": obj,
                                        "model": model, "choices": [],
                                        "usage": {
                                            "prompt_tokens": np_,
                                            "completion_tokens": nc,
                                            "total_tokens": np_ + nc,
                                        },
                                    }) + "\n\n").encode())
                            self.wfile.write(b"data: [DONE]\n\n")
                            self.wfile.flush()
                            break
                        if pend.tool_stream:
                            tool_feed(chunk)
                        else:
                            emit(chunk, None)
                except (BrokenPipeError, ConnectionResetError):
                    # Client went away mid-stream: ask the engine thread to
                    # stop generating for them (no JAX access from here).
                    outer._cancels.put(pend)

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
