"""Minimal HTTP serving front-end over the continuous-batching scheduler.

Stdlib only (``http.server`` + a scheduler thread) — the reference ships a
one-shot CLI (``Inference/Inference.py``); a production deployment needs a
process that accepts requests over the wire while earlier ones decode. This
module is that process:

- a background thread drives ``ContinuousBatchingServer.step()`` whenever
  work is pending (admissions interleave with decode per the scheduler);
- ``POST /generate``  — synchronous: submit and wait; body
  ``{"input_ids": [...], "pixel_values": [[..]] (optional, [3,H,W]),
  "max_new_tokens": N, "adapter_id"?: i}``; or the text surface:
  ``{"prompt": "...", "image"?: <base64 image file>, ...}`` which runs the
  reference preprocessing pipeline server-side (template + tokenize +
  resize/rescale/normalize); returns ``{"request_id", "tokens", "text"?}``;
- ``POST /submit`` — asynchronous: returns ``{"request_id"}`` immediately;
- ``GET /result/<rid>`` — ``{"finished": bool, "tokens": [...]}`` so far;
- ``GET /stats`` — scheduler occupancy/queue/progress counters;
- ``POST /prefix`` — register a shared prompt prefix (prefix caching): body
  ``{"input_ids": [...], "pixel_values"?}`` → ``{"prefix_id"}``; subsequent
  text requests auto-match it (or pin with ``"prefix_id"`` in
  ``/generate``/``/submit``); ``DELETE /prefix/<pid>`` releases it;
- ``POST /generate_stream`` — server-sent events: tokens stream as they
  decode (``data: {"tokens": [...]}`` deltas, final
  ``data: {"finished": true, ...}`` event);
- ``DELETE /request/<rid>`` — cancel a queued or running request;
- ``"adapter_id": i`` in any submit body selects a LoRA from the server's
  adapter bank (multi-LoRA serving);
- ``"timeout_s": t`` in any submit body sets a per-request deadline — a
  request still queued or decoding after ``t`` seconds finishes early with
  ``"timed_out": true`` in its result;
- backpressure: the admission queue is bounded (``--max-queue``); a full
  queue answers 429 instead of growing host memory silently;
- an SSE client that disconnects mid-stream has its request cancelled;
- shutdown drains: new submissions are refused (429) while in-flight
  requests run to completion.

All scheduler access is serialized by one lock (the compiled programs do the
heavy lifting on device; the lock is held for host-side bookkeeping plus one
dispatch at a time).

Run: ``python -m llama32mm_tpu.inference.http_server --hf-weights DIR
[--quantize int8] [--port 8000] ...``
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from llama32mm_tpu.inference.server import QueueFullError


class ServingFrontend:
    """Owns a ContinuousBatchingServer + the scheduler thread."""

    def __init__(self, server, tokenizer=None, processor=None):
        self.srv = server
        self.tokenizer = tokenizer
        self.processor = processor  # MllamaImageProcessor for prompt+image bodies
        self._lock = threading.Lock()
        self._work = threading.Event()
        self._done_events: dict[int, threading.Event] = {}
        self._stop = False
        self._draining = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _pending(self) -> bool:
        s = self.srv
        return bool(
            s._queue or s._inflight is not None
            or any(r is not None for r in s._by_slot)
        )

    def _loop(self):
        while not self._stop:
            with self._lock:
                pending = self._pending()
                finished = self.srv.step() if pending else []
            for rid in finished:
                ev = self._done_events.pop(rid, None)
                if ev is not None:
                    ev.set()
            if not pending:
                self._work.wait(timeout=0.05)
                self._work.clear()

    def submit(self, input_ids, pixel_values, max_new_tokens: int,
               prefix_id: Optional[int] = None, adapter_id: int = 0,
               temperature=None, top_p=None, top_k=None,
               min_p=None, repetition_penalty=None,
               timeout_s: Optional[float] = None) -> int:
        with self._lock:
            if self._draining:
                raise QueueFullError("server is draining — not accepting requests")
            rid = self.srv.submit(
                input_ids, pixel_values, max_new_tokens,
                prefix_id=prefix_id, adapter_id=adapter_id,
                temperature=temperature, top_p=top_p, top_k=top_k,
                min_p=min_p, repetition_penalty=repetition_penalty,
                timeout_s=timeout_s,
            )
            self._done_events[rid] = threading.Event()
        self._work.set()
        return rid

    def encode_request(self, req: dict):
        """Resolve a request body to ``(input_ids, pixel_values)``. Accepts
        raw ``input_ids`` (+ optional ``pixel_values``) or the text surface:
        ``prompt`` (str) + optional ``image`` (base64-encoded image file),
        which runs the reference preprocessing pipeline
        (``MllamaImageProcessor``: <image>*N + bos + prompt + template,
        bicubic resize / rescale / normalize — processing_mllama.py:16-43)."""
        if "input_ids" in req:
            ids = np.asarray(req["input_ids"], np.int32)
            px = req.get("pixel_values")
            return ids, None if px is None else np.asarray(px, np.float32)
        prompt = req["prompt"]  # KeyError → 400 (need input_ids or prompt)
        img_b64 = req.get("image")
        if img_b64 is None:
            if self.tokenizer is None:
                raise ValueError("server has no tokenizer — send input_ids")
            text = (getattr(self.tokenizer, "bos_token", None) or "") + prompt
            # BOS is prepended manually above, so suppress the tokenizer's own
            # auto-BOS here rather than relying on MllamaImageProcessor having
            # set add_bos_token=False at construction (a frontend built with a
            # tokenizer but no processor would otherwise double-add BOS).
            if hasattr(self.tokenizer, "add_bos_token"):
                self.tokenizer.add_bos_token = False
            if hasattr(self.tokenizer, "add_eos_token"):
                self.tokenizer.add_eos_token = False
            ids = self.tokenizer(
                [text], return_tensors="np", padding=True, truncation=False
            )["input_ids"][0]
            return np.asarray(ids, np.int64).astype(np.int32), None
        if self.processor is None:
            raise ValueError("server has no image processor — send input_ids")
        import base64
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(img_b64))).convert("RGB")
        out = self.processor([prompt], [img], padding=True)
        return (
            np.asarray(out["input_ids"][0], np.int32),
            np.asarray(out["pixel_values"][0], np.float32),
        )

    def register_prefix(self, input_ids, pixel_values=None, adapter_id: int = 0) -> int:
        with self._lock:
            return self.srv.register_prefix(
                input_ids, pixel_values, adapter_id=adapter_id
            )

    def tokens_so_far(self, rid: int) -> tuple[list, bool]:
        with self._lock:
            return (
                [int(t) for t in self.srv.tokens_so_far(rid)],
                self.srv.is_finished(rid),
            )

    def drop_prefix(self, prefix_id: int) -> None:
        with self._lock:
            self.srv.drop_prefix(prefix_id)

    def cancel(self, rid: int) -> bool:
        """Cancel a live request; on an already-finished one, evict its
        result record instead (DELETE /request/<id> doubles as cleanup for
        long-running servers)."""
        with self._lock:
            ok = self.srv.cancel(rid)
            if not ok:
                self.srv.release(rid)
        ev = self._done_events.pop(rid, None)
        if ev is not None:
            ev.set()  # release any /generate waiter
        return ok

    def wait(self, rid: int, timeout: Optional[float] = None) -> bool:
        ev = self._done_events.get(rid)
        if ev is None:  # already finished (event popped by the loop)
            return True
        return ev.wait(timeout)

    def result(self, rid: int) -> dict:
        with self._lock:
            toks = [int(t) for t in self.srv.tokens_so_far(rid)]
            fin = self.srv.is_finished(rid)
            req = self.srv._results.get(rid)
            timed_out = bool(req is not None and req.timed_out)
        out = {"request_id": rid, "finished": fin, "tokens": toks}
        if timed_out:
            out["timed_out"] = True
        if fin and self.tokenizer is not None:
            out["text"] = self.tokenizer.decode(toks, skip_special_tokens=True).strip()
        return out

    def stats(self) -> dict:
        with self._lock:
            return self.srv.stats()

    def drain(self, timeout: Optional[float] = 30.0) -> bool:
        """Graceful drain: stop accepting new submissions (subsequent
        ``submit`` raises QueueFullError) and wait for everything queued or
        decoding to finish. Returns True if fully drained within
        ``timeout`` seconds (None = wait forever)."""
        with self._lock:
            self._draining = True
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            with self._lock:
                if not self._pending():
                    return True
            if deadline is not None and time.monotonic() >= deadline:
                return False
            self._work.set()
            time.sleep(0.02)

    def shutdown(self, drain: bool = False, drain_timeout: Optional[float] = 30.0):
        """Stop the scheduler thread. ``drain=True`` first refuses new work
        and lets in-flight requests finish (bounded by ``drain_timeout``)."""
        if drain:
            self.drain(drain_timeout)
        self._stop = True
        self._work.set()
        self._thread.join(timeout=5)


def make_handler(frontend: ServingFrontend):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def _sse(self, rid: int):
            """Stream a request's tokens as server-sent events: one
            ``data: {"request_id", "tokens": [...newly decoded...]}`` event
            per scheduler sync, then a final event with ``finished: true``
            and the decoded text (if a tokenizer is attached). A client that
            disconnects mid-stream gets its request CANCELLED — a vanished
            consumer must not keep a decode slot busy to budget."""
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            sent = 0
            try:
                while True:
                    done = frontend.wait(rid, timeout=0.02)
                    toks, fin = frontend.tokens_so_far(rid)
                    if len(toks) > sent:
                        ev = {"request_id": rid, "tokens": toks[sent:]}
                        self.wfile.write(f"data: {json.dumps(ev)}\n\n".encode())
                        self.wfile.flush()
                        sent = len(toks)
                    if fin or done:
                        final = frontend.result(rid)
                        self.wfile.write(f"data: {json.dumps(final)}\n\n".encode())
                        self.wfile.flush()
                        return
            except (BrokenPipeError, ConnectionResetError, OSError):
                frontend.cancel(rid)  # reclaim the slot / dequeue

        def do_GET(self):
            try:
                if self.path == "/stats":
                    return self._json(200, frontend.stats())
                if self.path.startswith("/result/"):
                    rid = int(self.path.rsplit("/", 1)[1])
                    return self._json(200, frontend.result(rid))
                return self._json(404, {"error": f"unknown path {self.path}"})
            except KeyError:
                return self._json(404, {"error": "unknown request id"})
            except Exception as e:  # pragma: no cover - defensive
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def do_POST(self):
            try:
                req = self._read_body()
                ids, px = frontend.encode_request(req)
                if self.path == "/prefix":
                    pid = frontend.register_prefix(
                        ids, px, adapter_id=int(req.get("adapter_id", 0))
                    )
                    return self._json(200, {"prefix_id": pid})
                mnt = int(req.get("max_new_tokens", 64))
                pfx = req.get("prefix_id")
                pfx = None if pfx is None else int(pfx)
                tmo = req.get("timeout_s")
                kw = dict(
                    prefix_id=pfx,
                    adapter_id=int(req.get("adapter_id", 0)),
                    temperature=req.get("temperature"),
                    top_p=req.get("top_p"),
                    top_k=req.get("top_k"),
                    min_p=req.get("min_p"),
                    repetition_penalty=req.get("repetition_penalty"),
                    timeout_s=None if tmo is None else float(tmo),
                )
                if self.path == "/submit":
                    rid = frontend.submit(ids, px, mnt, **kw)
                    return self._json(200, {"request_id": rid})
                if self.path == "/generate":
                    rid = frontend.submit(ids, px, mnt, **kw)
                    frontend.wait(rid)
                    return self._json(200, frontend.result(rid))
                if self.path == "/generate_stream":
                    rid = frontend.submit(ids, px, mnt, **kw)
                    return self._sse(rid)
                return self._json(404, {"error": f"unknown path {self.path}"})
            except QueueFullError as e:
                return self._json(429, {"error": str(e)})
            except (KeyError, ValueError, TypeError) as e:
                return self._json(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # pragma: no cover - defensive
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def do_DELETE(self):
            try:
                if self.path.startswith("/prefix/"):
                    try:
                        frontend.drop_prefix(int(self.path.rsplit("/", 1)[1]))
                    except KeyError:
                        return self._json(404, {"error": "unknown prefix id"})
                    return self._json(200, {"ok": True})
                if self.path.startswith("/request/"):
                    try:
                        ok = frontend.cancel(int(self.path.rsplit("/", 1)[1]))
                    except KeyError:
                        return self._json(404, {"error": "unknown request id"})
                    return self._json(200, {"cancelled": ok})
                return self._json(404, {"error": f"unknown path {self.path}"})
            except Exception as e:  # pragma: no cover - defensive
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve_forever(frontend: ServingFrontend, host: str = "0.0.0.0", port: int = 8000):
    httpd = ThreadingHTTPServer((host, port), make_handler(frontend))
    return httpd


def main(argv=None):
    parser = argparse.ArgumentParser(description="llama32mm-tpu HTTP serving")
    parser.add_argument("--hf-weights", required=True)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--slots", type=int, default=4)
    parser.add_argument("--max-queue", type=int, default=64,
                        help="admission queue bound; a full queue returns "
                        "HTTP 429 (0 = unbounded)")
    parser.add_argument("--max-cache-length", type=int, default=2048)
    parser.add_argument("--quantize", choices=["none", "int8", "int4"], default="none")
    parser.add_argument("--prefill-chunk", type=int, default=None)
    parser.add_argument("--spec-lookup", type=int, default=0,
                        help="K>0: batched prompt-lookup speculative decoding "
                        "(greedy-only).")
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args(argv)

    from llama32mm_tpu.inference.server import ContinuousBatchingServer
    from llama32mm_tpu.io.checkpoint import load_hf_model

    model, tokenizer = load_hf_model(
        args.hf_weights, dtype=args.dtype,
        max_cache_length=args.max_cache_length,
        streaming=args.quantize != "none",
        quantize_int8=args.quantize == "int8",
        quantize_int4=args.quantize == "int4",
    )
    srv = ContinuousBatchingServer(
        model.params, model.config, slots=args.slots,
        max_cache_length=args.max_cache_length,
        kv_dtype="int8" if args.quantize != "none" else None,
        eos_token_id=tokenizer.eos_token_id if tokenizer.eos_token_id is not None else -1,
        prefill_chunk=args.prefill_chunk,
        spec_lookup=args.spec_lookup,
        max_queue=args.max_queue if args.max_queue > 0 else None,
    )
    from llama32mm_tpu.preprocess.processor import MllamaImageProcessor

    processor = MllamaImageProcessor(
        tokenizer,
        model.config.text_config.num_image_tokens,
        model.config.vision_config.image_size,
    )
    print("compiling decode programs...", flush=True)
    srv.warmup()  # compile the decode ladder before accepting traffic
    frontend = ServingFrontend(srv, tokenizer, processor)
    httpd = serve_forever(frontend, args.host, args.port)
    print(f"serving on {args.host}:{args.port} "
          f"(slots={args.slots}, quantize={args.quantize})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        # graceful drain: refuse new work, let in-flight requests finish
        print("draining...", flush=True)
        frontend.shutdown(drain=True, drain_timeout=60.0)


if __name__ == "__main__":
    main()
