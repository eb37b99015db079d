"""Serving CLI: continuous-batching inference over many requests.

The reference has no serving story at all — its CLI handles exactly one
request per process with a hard B==1 assert (ref: inference.py:109-154,
processing_paligemma.py:174). This entrypoint exposes the framework's
continuous-batching engines (runtime/serving.py, runtime/serving_paged.py)
behind two user-facing modes:

* **batch mode** (``--requests_jsonl FILE`` or ``-`` for stdin): read one
  JSON request per line, run them all through the engine with continuous
  batching (slots refill as requests finish — no head-of-line blocking),
  and print one JSON result line per request in completion order.
* **HTTP mode** (``--http PORT``): a minimal stdlib HTTP server.
  ``POST /generate`` with the same JSON request shape returns the decoded
  text; ``GET /healthz`` reports engine stats. A single background thread
  owns the engine and ticks it while work exists; handlers block on a
  per-request completion event, so concurrent requests batch together
  into the same lockstep decode ticks. Pass ``"stream": true`` for
  server-sent events: one ``data: {"token", "text_delta"}`` event per
  accepted token (window-sized bursts — the scheduler syncs every
  ``sync_every`` ticks) and a final ``data: {..., "done": true}``.
  ``POST /cancel`` with ``{"request_id": N}`` cancels a queued or
  in-flight request (its slot frees immediately; a blocked or streaming
  /generate handler for it returns ``{"cancelled": true}``).

Request JSON: ``{"prompt": str, "image": path}`` plus optional
``request_id``, ``max_new_tokens``, ``do_sample``, ``temperature``,
``top_p``, ``lora`` (adapter name registered via ``--lora``); HTTP
requests may pass ``image_b64`` (base64-encoded image bytes) instead of
a server-local path.

Engine selection: ``--engine dense`` (default) is the slot-pool engine —
supports tensor/data-parallel meshes (``--model_parallel``);
``--engine paged`` is the paged-KV engine (more live requests from the
same HBM) — also mesh-capable (TP, and a data axis for slot/pool
sharding). Grammar constraints, LoRA banks, speculative decoding, and
the prefix cache all compose with the paged engine — under any mesh
(single-chip, pure-TP, pure-DP, or DP x TP).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import sys
import threading
from typing import Optional

import numpy as np


def main(argv=None):
    from .errors import user_errors

    with user_errors():
        _main(argv)


def _build_parser():
    p = argparse.ArgumentParser(
        description="PaliGemma TPU continuous-batching server")
    p.add_argument("--model_path", required=True,
                   help="HF checkpoint directory")
    p.add_argument("--engine", default="dense", choices=["dense", "paged"])
    p.add_argument("--requests_jsonl", default=None,
                   help="JSONL request file, or '-' for stdin (batch mode)")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve HTTP on this port instead of batch mode")
    p.add_argument("--max_slots", type=int, default=8)
    p.add_argument("--max_seq_len", type=int, default=1024)
    p.add_argument("--page_size", type=int, default=64,
                   help="paged engine: tokens per KV page")
    p.add_argument("--n_pages", type=int, default=None,
                   help="paged engine: physical page-pool size "
                        "(default: half the dense reservation)")
    p.add_argument("--sync_every", type=int, default=8,
                   help="decode ticks per host synchronization")
    p.add_argument("--prefix_cache", action="store_true",
                   help="exact-match prefix KV reuse — a byte-identical "
                        "(image, prompt) pair seats with no prefill "
                        "(prefix-LM allows exact matches only; paged: "
                        "zero-copy page borrowing, dense: KV row copies)")
    p.add_argument("--spec_decode", action="store_true",
                   help="n-gram speculative decoding inside the batched "
                        "tick (greedy-only — requests with do_sample are "
                        "rejected; wins on repetitive outputs, see "
                        "docs/PERFORMANCE.md). Dense engine composes with "
                        "--model_parallel (GSPMD-sharded verify forward); "
                        "paged engine is single-chip")
    p.add_argument("--spec_draft_k", type=int, default=8,
                   help="drafted tokens per speculative verify cycle")
    p.add_argument("--grammar", action="append", default=[],
                   metavar="NAME=REGEX",
                   help="dense engine: register a constrained-decoding "
                        "grammar (regex subset over the OUTPUT text, e.g. "
                        "yes|no or \\d+(,\\d+)*) — repeatable; requests "
                        'pick one with {"grammar": NAME}. Constrained rows '
                        "can only emit tokens keeping the output a valid "
                        "prefix, and can only stop on a complete match")
    p.add_argument("--lora", action="append", default=[], metavar="NAME=DIR",
                   help="serve LoRA adapter DIR (a finetune "
                        "checkpoint from cli.finetune, e.g. out/final) "
                        "under NAME — repeatable; requests pick one with "
                        '{"lora": NAME} (omit for the base model). All '
                        "adapters decode in the same batched tick")
    p.add_argument("--max_new_tokens", type=int, default=100,
                   help="default per-request budget")
    p.add_argument("--quantize_int8", action="store_true",
                   help="int8 weight-only decode (recommended)")
    p.add_argument("--int8_prefill", action="store_true",
                   help="prefill from the int8 tree too (drops the bf16 "
                        "copy from HBM; W8A8 MXU prefill dots). Requires "
                        "--quantize_int8")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--only_cpu", action="store_true")
    p.add_argument("--data_parallel", type=int, default=1)
    p.add_argument("--model_parallel", type=int, default=1,
                   help="dense engine only: tensor-parallel width")
    return p


def _main(argv=None):
    args = _build_parser().parse_args(argv)
    from .errors import require

    require(args.requests_jsonl is not None or args.http is not None,
            "pass --requests_jsonl FILE (or -) for batch mode, "
            "or --http PORT for server mode")
    srv = build_server(args)
    if args.http is not None:
        srv.serve_http(args.http)
    else:
        srv.run_batch(args.requests_jsonl)


def build_server(args):
    """Load the model and wire up a ready-to-run ``_Server`` (separated
    from ``_main`` so tests can drive HTTP mode in-process)."""
    from .errors import require

    if args.only_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from ..checkpoints.hf_loader import load_hf_model
    from ..processing.processor import PaliGemmaProcessor
    from ..runtime.quantize import quantize_lm_for_serving
    from ..runtime.serving import ServingEngine
    from ..runtime.serving_paged import PagedServingEngine

    print(f"Device in use: {jax.devices()[0]}", file=sys.stderr)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params, config = load_hf_model(args.model_path, dtype)
    decode_params = (
        quantize_lm_for_serving(params) if args.quantize_int8 else None
    )
    int8_act_prefill = False
    if getattr(args, "int8_prefill", False):
        require(args.quantize_int8, "--int8_prefill requires --quantize_int8")
        params = decode_params  # single-copy serving: bf16 tree dropped
        int8_act_prefill = True
    tokenizer = AutoTokenizer.from_pretrained(
        args.model_path, padding_side="right")
    processor = PaliGemmaProcessor(
        tokenizer,
        num_image_tokens=config.vision_config.num_image_tokens,
        image_size=config.vision_config.image_size,
    )

    lora_bank = None
    if args.lora:
        from ..checkpoints.local import restore_pytree

        lora_bank = {}
        for spec in args.lora:
            require("=" in spec, f"--lora expects NAME=DIR, got {spec!r}")
            name, path = spec.split("=", 1)
            require(name not in lora_bank,
                    f"--lora adapter name {name!r} given twice")
            state = restore_pytree(path)
            require(isinstance(state, dict) and "lora" in state,
                    f"{path} is not a LoRA finetune checkpoint (expected "
                    "the cli.finetune save layout with a 'lora' subtree; "
                    "full fine-tunes have no adapter to serve — export "
                    "and load them as a base model instead)")
            lora_bank[name] = state["lora"]
    mesh = None
    if args.data_parallel * args.model_parallel > 1:
        # dense serving is pure TP (slots are the batch; see
        # runtime/serving.py); the PAGED engine also accepts a data axis —
        # slots and the page pool shard over it (runtime/serving_paged.py)
        require(args.engine == "paged" or args.data_parallel == 1,
                "--engine dense shards weights only (pure TP): use "
                "--model_parallel N with --data_parallel 1, or "
                "--engine paged for a data axis")
        require(args.engine == "dense" or args.max_slots % args.data_parallel == 0,
                "--max_slots must divide evenly over --data_parallel shards")
        from ..core.mesh import make_mesh

        mesh = make_mesh(args.data_parallel, args.model_parallel)

    grammars = None
    if args.grammar:
        from ..processing.grammar import (
            compile_regex,
            compile_token_dfa,
            token_strings_from_tokenizer,
        )

        strs = token_strings_from_tokenizer(
            tokenizer, min(len(tokenizer), config.vocab_size)
        )
        strs += [""] * (config.vocab_size - len(strs))
        grammars = {}
        for spec in args.grammar:
            require("=" in spec, f"--grammar expects NAME=REGEX, got {spec!r}")
            name, pattern = spec.split("=", 1)
            require(name not in grammars,
                    f"--grammar name {name!r} given twice")
            try:
                dfa = compile_regex(pattern)
            except ValueError as e:
                from .errors import CliError

                raise CliError(f"--grammar {name}: {e}")
            grammars[name] = compile_token_dfa(
                dfa, strs, tokenizer.eos_token_id
            )

    if args.engine == "paged":
        engine = PagedServingEngine(
            params, config, max_slots=args.max_slots,
            max_seq_len=args.max_seq_len, page_size=args.page_size,
            n_pages=args.n_pages, decode_params=decode_params,
            sync_every=args.sync_every, mesh=mesh,
            prefix_cache=args.prefix_cache,
            spec_decode=args.spec_decode, spec_draft_k=args.spec_draft_k,
            lora_bank=lora_bank, grammars=grammars,
            int8_act_prefill=int8_act_prefill,
        )
    else:
        engine = ServingEngine(
            params, config, max_slots=args.max_slots,
            max_seq_len=args.max_seq_len, decode_params=decode_params,
            sync_every=args.sync_every, mesh=mesh,
            prefix_cache=args.prefix_cache,
            spec_decode=args.spec_decode, spec_draft_k=args.spec_draft_k,
            lora_bank=lora_bank, grammars=grammars,
            int8_act_prefill=int8_act_prefill,
        )

    return _Server(engine, processor, tokenizer, args.max_new_tokens)


class _Server:
    """Shared request plumbing for batch and HTTP modes."""

    def __init__(self, engine, processor, tokenizer, default_max_new):
        self.engine = engine
        self.processor = processor
        self.tokenizer = tokenizer
        self.default_max_new = default_max_new
        self._next_id = 0
        self._served = 0
        self._served_tokens = 0

    def _to_request(self, row, image=None):
        """JSON dict -> runtime Request (tokenize + preprocess here, on the
        host, so engine ticks stay pure device work)."""
        from PIL import Image

        from ..runtime.serving import Request
        from .errors import require

        require("prompt" in row, "request JSON needs a 'prompt' field")
        if image is None:
            if "image_b64" in row:
                image = Image.open(
                    io.BytesIO(base64.b64decode(row["image_b64"])))
            else:
                require("image" in row,
                        "request JSON needs 'image' (path) or 'image_b64'")
                image = Image.open(row["image"])
        inputs = self.processor(images=[image], text=[row["prompt"]])
        rid = row.get("request_id")
        if rid is None:
            rid = self._next_id
        self._next_id = max(self._next_id + 1, int(rid) + 1)
        return Request(
            request_id=int(rid),
            input_ids=np.asarray(inputs["input_ids"][0], np.int32),
            pixel_values=np.asarray(inputs["pixel_values"][0], np.float32),
            max_new_tokens=int(
                row.get("max_new_tokens", self.default_max_new)),
            temperature=float(row.get("temperature", 0.8)),
            top_p=float(row.get("top_p", 0.9)),
            do_sample=bool(row.get("do_sample", False)),
            eos_token_id=self.tokenizer.eos_token_id,
            lora=row.get("lora"),
            grammar=row.get("grammar"),
        )

    def _result(self, req):
        self._served += 1
        self._served_tokens += len(req.tokens)
        return {
            "request_id": req.request_id,
            "text": self.tokenizer.decode(
                req.tokens, skip_special_tokens=True),
            "num_tokens": len(req.tokens),
            # engine-stamped wall-clock latencies (runtime/serving.py
            # Request.metrics: queue_ms, ttft_ms, total_ms, decode t/s)
            **req.metrics(),
        }

    # ---- batch mode ----

    def run_batch(self, path):
        from .errors import CliError, require

        fh = sys.stdin if path == "-" else open(path)
        try:
            rows = [json.loads(ln) for ln in fh if ln.strip()]
        except json.JSONDecodeError as e:
            raise CliError(f"bad JSON in requests file: {e}")
        finally:
            if fh is not sys.stdin:
                fh.close()
        require(rows, "requests file is empty")
        for row in rows:
            self.engine.submit(self._to_request(row))
        while self.engine.has_work:
            for req in self.engine.step():
                print(json.dumps(self._result(req)), flush=True)
        print(f"served {self._served} requests", file=sys.stderr)

    # ---- HTTP mode ----

    def serve_http(self, port, ready_event=None, max_requests=None):
        """Single engine-owner thread + blocking handlers.

        ``ready_event``/``max_requests`` exist for tests: the event fires
        once the socket is listening, and the server shuts itself down
        after serving that many /generate calls.
        """
        import http.server
        import socketserver

        lock = threading.Lock()  # guards engine.submit vs the tick loop
        work = threading.Event()  # something was submitted
        events = {}  # request_id -> (Event, result slot)
        srv_ref = {}

        def engine_loop():
            while True:
                work.wait()
                with lock:
                    if not self.engine.has_work:
                        work.clear()
                        continue
                    done = self.engine.step()
                for req in done:
                    # pop-with-default: a /cancel may have raced us and
                    # already resolved this id's waiter
                    pending = events.pop(req.request_id, None)
                    if pending is None:
                        continue
                    ev, slot = pending
                    slot.append(self._result(req))
                    ev.set()

        t = threading.Thread(target=engine_loop, daemon=True)
        t.start()
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, {
                        "ok": True,
                        "served": outer._served,
                        "served_tokens": outer._served_tokens,
                        "pending": len(events),
                    })
                else:
                    self._reply(404, {"error": "unknown path"})

            def do_POST(self):
                if self.path == "/cancel":
                    try:
                        n = int(self.headers.get("Content-Length", 0))
                        rid = int(json.loads(self.rfile.read(n))["request_id"])
                    except Exception as e:
                        self._reply(400, {"error": str(e)})
                        return
                    with lock:
                        ok = outer.engine.cancel(rid)
                        pending = events.pop(rid, None)
                    if pending is not None:
                        ev_c, slot_c = pending
                        slot_c.append({"request_id": rid, "cancelled": True,
                                       "num_tokens": None})
                        ev_c.set()  # unblock the waiting /generate handler
                    self._reply(200, {"request_id": rid, "cancelled": ok})
                    return
                if self.path != "/generate":
                    self._reply(404, {"error": "unknown path"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    row = json.loads(self.rfile.read(n))
                    stream = bool(row.get("stream", False))
                    tok_q: Optional[queue.Queue] = (
                        queue.Queue() if stream else None
                    )
                    with lock:
                        req = outer._to_request(row)
                        if stream:
                            # scheduler-thread hook: accepted tokens arrive
                            # in window-sized bursts (runtime/serving.py
                            # _absorb), each relayed as one SSE event
                            req.on_token = tok_q.put
                        ev, slot = threading.Event(), []
                        events[req.request_id] = (ev, slot)
                        outer.engine.submit(req)
                    work.set()
                except Exception as e:  # bad request, not a server bug
                    self._reply(400, {"error": str(e)})
                    return
                if stream:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()
                    while True:
                        try:
                            tok = tok_q.get(timeout=0.05)
                        except queue.Empty:
                            if ev.is_set() and tok_q.empty():
                                break
                            continue
                        delta = outer.tokenizer.decode(
                            [tok], skip_special_tokens=True)
                        self.wfile.write(
                            ("data: " + json.dumps(
                                {"token": int(tok), "text_delta": delta}
                            ) + "\n\n").encode())
                        self.wfile.flush()
                    self.wfile.write(
                        ("data: " + json.dumps(
                            {**slot[0], "done": True}) + "\n\n").encode())
                    self.wfile.flush()
                else:
                    ev.wait()
                    self._reply(200, slot[0])
                if (max_requests is not None
                        and outer._served >= max_requests):
                    threading.Thread(
                        target=srv_ref["srv"].shutdown, daemon=True
                    ).start()

        class Srv(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        with Srv(("127.0.0.1", port), Handler) as srv:
            srv_ref["srv"] = srv
            self.http_port = srv.server_address[1]
            print(f"listening on http://127.0.0.1:{self.http_port}",
                  file=sys.stderr)
            if ready_event is not None:
                ready_event.set()
            srv.serve_forever()


if __name__ == "__main__":
    main()
