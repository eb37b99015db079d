"""Inference engine: jitted prefill + donated single-token decode.

TPU-native replacement for the reference decode loop (ref: inference.py:29-87),
which re-runs the full model -- including the 27-layer vision tower -- on
every generated token and grows a Python-list KV cache with torch.cat.

Design:

* ``prefill``: one jitted call — vision encode + merge + decoder over the
  whole prompt, writing the preallocated KV cache at [0, S).
* ``decode_step``: one jitted call per token with the KV state donated
  (``donate_argnums``), so XLA updates the cache in place in HBM — zero
  reallocation, fixed shapes, no recompilation across steps.
* ``generate``: Python loop with host-side EOS early exit — the same
  contract as the reference CLI (greedy or temperature/top-p, stop at EOS,
  ref: inference.py:51-87) but batched.
* ``generate_fused``: the whole decode loop inside one jit (lax.scan with
  per-row EOS masking) for serving/benchmarks — no host round trip per token.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PaliGemmaConfig
from ..models import gemma, paligemma
from ..ops import sampling


class KVState(NamedTuple):
    """Donated decode state (a pytree)."""

    cache: Dict[str, jnp.ndarray]
    valid: jnp.ndarray  # (B, max_seq) bool — attendable cache slots
    write_pos: jnp.ndarray  # scalar int32 — next cache write index
    pos_ids: jnp.ndarray  # (B,) int32 — RoPE position of the *next* token


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class PaliGemmaEngine:
    """Stateless-functionally, statefully-ergonomic inference driver."""

    def __init__(
        self,
        params: Dict[str, Any],
        config: PaliGemmaConfig,
        max_seq_len: int = 1024,
        cache_dtype=None,
        eos_token_id: int = 1,
        use_flash: Optional[bool] = None,
        mesh=None,
        decode_params: Optional[Dict[str, Any]] = None,
        decode_scan_block: int = 1,
        fused_mlp: Optional[bool] = None,
        fused_layer: Optional[bool] = None,
        int8_act_prefill: bool = False,
    ):
        """``mesh``: optional jax.sharding.Mesh("data","model") — weights get
        Megatron-style TP shardings on "model" and the batch shards on
        "data"; XLA inserts the ICI collectives. Same code path 1-chip and
        v5e-8 (the reference's only parallelism is a DDP toy, ref: test.py).

        ``decode_scan_block``: decoder layers per scan body in the decode
        jits (gemma.forward scan_block) — g>1 halves/thirds the per-step
        while-loop overhead at B=1; must divide the layer count (else
        silently 1).

        ``decode_params``: optional second weight set used only by
        decode_step — e.g. int8-quantized weights (runtime.quantize) while
        ``params`` stays bf16 for the compute-bound prefill. Splitting the
        two phases this way gets the best TTFT *and* the best decode
        tokens/s at the cost of holding both copies in HBM.

        ``int8_act_prefill``: when ``params`` itself is the int8 tree
        (single-copy serving), run the LM prefill projections as W8A8
        int8 x int8 MXU dots with dynamic per-row activation scales —
        measured ~1.5x the bf16-convert dot at prefill shapes
        (.bench/int8_prefill_probe.py). Decode-sized calls and the
        logits head keep the exact convert path (kernels/quant.py
        matmul_any row gate). Opt-in: adds activation-rounding error at
        prefill (weights-only int8 stays default)."""
        self.config = config
        self.max_seq_len = max_seq_len
        self.eos_token_id = eos_token_id
        self.cache_dtype = cache_dtype or params["lm"]["embed"].dtype
        if use_flash is None:
            use_flash = jax.default_backend() == "tpu"
        if use_flash and mesh is not None:
            # the flash kernel runs under a mesh via shard_map (heads on
            # "model"); fall back to XLA attention for head counts the
            # sharding can't express
            hq = config.text_config.num_attention_heads
            hkv = config.text_config.num_key_value_heads
            m = mesh.shape["model"]
            ok_lm = hq % m == 0 and (hkv % m == 0 or (hq // m) % hkv == 0)
            hv = config.vision_config.num_attention_heads
            ok_vis = hv % m == 0
            if not (ok_lm and ok_vis):
                use_flash = False
        self.use_flash = use_flash
        self.int8_act_prefill = bool(int8_act_prefill)
        self.decode_scan_block = decode_scan_block
        # Fused int8 decode-MLP Pallas kernel (kernels/decode_mlp).
        # Currently opt-in while the DMA schedule is tuned against the XLA
        # path (see kernel docstring / docs/PERFORMANCE.md). gemma.forward
        # additionally gates on S==1 and mesh-free params.
        if fused_mlp is None:
            fused_mlp = False
        self.fused_mlp = fused_mlp
        # Whole-layer fused decode kernel (kernels/decode_layer): subsumes
        # fused_mlp. Default ON for TPU int8 decode — measured 3.578 vs
        # 3.761 ms/step at the 3B bench shape. Under a mesh the TP variant
        # (kernels/decode_layer_tp: per-layer kernels + psum glue) is used
        # instead of the grid-over-layers kernel.
        if fused_layer is None:
            fused_layer = jax.default_backend() == "tpu"
        self.fused_layer = fused_layer
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding

            from ..core import mesh as mesh_lib

            pspecs = mesh_lib.param_specs(params)
            params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, pspecs
            )
            if decode_params is not None:
                dspecs = mesh_lib.param_specs(decode_params)
                decode_params = jax.tree.map(
                    lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                    decode_params, dspecs,
                )
        self.params = params
        self.decode_params = decode_params if decode_params is not None else params

        # Under a mesh, the fused decode path is the tensor-parallel
        # variant: per-layer kernels under shard_map with the o/down psums
        # in the XLA glue (the single grid-over-layers kernel cannot host
        # the per-layer collectives). Structural support is checked here;
        # the per-call batch bound (32 rows per data shard) gates in
        # decode_chunk.
        self._tp_packed = self._tp_specs = None
        if mesh is not None and (self.fused_mlp or self.fused_layer):
            from ..kernels import decode_layer_tp as _tp

            tc = config.text_config
            layers = self.decode_params["lm"]["layers"]
            if (
                _tp.supported(tc, mesh, layers, batch=1)
                and "head_q" in self.decode_params["lm"]
            ):
                self._tp_packed, self._tp_specs = _tp.repack_for_tp(
                    self.decode_params["lm"], tc, mesh
                )
            self.fused_mlp = False
            self.fused_layer = False

        if self.fused_mlp or self.fused_layer:
            from ..kernels import decode_layer as _dl
            from ..kernels import decode_mlp as _dm

            layers = self.decode_params["lm"]["layers"]
            tc = config.text_config
            if self.fused_layer and not (
                tc.num_key_value_heads == 1
                and tc.head_dim % 128 == 0
                and isinstance(layers["attn"].get("qkv"), dict)
                and _dm.supported(layers["mlp"])
            ):
                self.fused_layer = False
            if not _dm.supported(layers["mlp"]):
                self.fused_mlp = False
            if self.fused_mlp or self.fused_layer:
                # one-time contiguous relayout for the fused kernels; only
                # the DECODE tree is rewritten — prefill keeps the original
                # gateup (the kernels are single-token-only)
                if self.fused_layer:
                    packed = jax.jit(_dl.repack_layers)(layers)
                else:
                    packed = dict(layers)
                    packed["mlp"] = jax.jit(_dm.repack)(layers["mlp"])
                dp = dict(self.decode_params)
                dp["lm"] = dict(dp["lm"])
                dp["lm"]["layers"] = packed
                if self.fused_layer and "head_q" in dp["lm"]:
                    from ..kernels import decode_head as _dh

                    dp["lm"]["head_q"] = jax.jit(_dh.repack_head)(
                        dp["lm"]["head_q"]
                    )
                self.decode_params = dp
        self._greedy_head_fused = (
            self.fused_layer
            and "w8_blk" in self.decode_params["lm"].get("head_q", {})
        )

        cfg = config  # closed over statically (frozen dataclass)

        # XLA:TPU rewrites (1, K) x (K, N) dots into VPU multiply-reduce
        # ("dot strength reduction") for some decode-shape matmuls; keeping
        # them on the MXU path measures ~2% faster end-to-end decode.
        self._decode_jit_opts = (
            {"xla_tpu_enable_dot_strength_reduction": "false"}
            if jax.default_backend() == "tpu"
            else None
        )

        _i8a = self.int8_act_prefill

        @functools.partial(jax.jit, donate_argnums=(4,))
        def _prefill(params, pixels, ids, mask, cache):
            # last_only: the head projects just each row's last valid token
            logits, cache = paligemma.prefill(
                params, cfg, pixels, ids, mask, cache, use_flash=use_flash,
                last_only=True, mesh=mesh if use_flash else None,
                int8_act=_i8a,
            )
            b, s = ids.shape
            valid = jnp.zeros((b, cache["k"].shape[2]), bool)
            valid = jax.lax.dynamic_update_slice(
                valid, mask.astype(bool), (jnp.zeros((), jnp.int32),) * 2
            )
            n_valid = jnp.sum(mask, axis=-1).astype(jnp.int32)  # (B,)
            state = KVState(
                cache=cache,
                valid=valid,
                write_pos=jnp.asarray(s, jnp.int32),
                pos_ids=n_valid + 1,  # positions are 1-indexed cumsum
            )
            return logits[:, 0], state

        @functools.partial(
            jax.jit, donate_argnums=(2,), compiler_options=self._decode_jit_opts
        )
        def _decode(params, token, state: KVState):
            valid = state.valid.at[:, state.write_pos].set(True)
            logits, cache = paligemma.decode_step(
                params, cfg, token, state.cache,
                cache_pos=state.write_pos, kv_valid=valid,
                position_ids=state.pos_ids, scan_block=decode_scan_block,
                fused_mlp=self.fused_mlp,
                    fused_layer=self.fused_layer,
            )
            new_state = KVState(
                cache=cache, valid=valid,
                write_pos=state.write_pos + 1, pos_ids=state.pos_ids + 1,
            )
            return logits, new_state

        self._prefill_fn = _prefill
        self._decode_fn = _decode
        self._fused_cache: Dict[Tuple, Any] = {}
        self._chunk_cache: Dict[Tuple, Any] = {}
        self._spec_cache: Dict[Tuple, Any] = {}

    # ------------------------------------------------------------------
    def init_state_cache(self, batch: int) -> Dict[str, jnp.ndarray]:
        cache = gemma.init_kv_cache(
            self.config.text_config, batch, self.max_seq_len, self.cache_dtype
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            from ..core import mesh as mesh_lib

            cache = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
                cache, mesh_lib.kv_cache_specs(),
            )
        return cache

    def _shard_batch(self, *arrays):
        if self.mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec as P

        return tuple(
            jax.device_put(
                a, NamedSharding(self.mesh, P("data", *([None] * (a.ndim - 1))))
            )
            for a in arrays
        )

    def prefill(self, pixel_values, input_ids, attention_mask):
        """Prefill the cache. Note: jit compiles once per distinct
        (batch, prompt_len) shape — for high request rates use the serving
        engine, which buckets prompt lengths."""
        cache = self.init_state_cache(input_ids.shape[0])
        pixel_values, input_ids, attention_mask = self._shard_batch(
            pixel_values, input_ids, attention_mask
        )
        return self._prefill_fn(
            self.params, pixel_values, input_ids, attention_mask, cache
        )

    def decode_step(self, token, state: KVState):
        return self._decode_fn(self.decode_params, token, state)

    def decode_chunk(
        self,
        logits,
        state: KVState,
        n_steps: int,
        temperature: float = 0.8,
        top_p: float = 0.9,
        do_sample: bool = False,
        key: Optional[jax.Array] = None,
        eos_token_id: Optional[int] = None,
        done: Optional[jnp.ndarray] = None,
        kv_bucket: Optional[int] = None,
    ):
        """``n_steps`` decode steps in ONE device dispatch (lax.scan), with
        token selection fused into the jit and per-row EOS masking.

        Per-token dispatch costs ~1-2 ms through a tunneled device and each
        host sync ~40 ms; chunking amortizes both, which is the difference
        between ~250 and ~270+ tok/s at 3B int8 b1 (docs/PERFORMANCE.md).
        Returns ``(logits, state, tokens (B, n_steps), done)`` — post-EOS
        slots are filled with EOS, exactly like ``generate``.

        ``kv_bucket``: static attended-cache window; MUST cover the highest
        write position this chunk reaches (write_pos + n_steps). Use
        :meth:`kv_bucket_for`. None attends the full cache.
        """
        eos = self.eos_token_id if eos_token_id is None else eos_token_id
        if key is None:
            key = jax.random.PRNGKey(0)
        if done is None:
            done = jnp.zeros((logits.shape[0],), bool)
        b = logits.shape[0]
        use_tp = False
        if self._tp_packed is not None and not do_sample:
            nd = int(self.mesh.shape.get("data", 1))
            use_tp = b % nd == 0 and b // nd <= 32
        fn = self._get_chunk(n_steps, temperature, top_p, do_sample, eos,
                             kv_bucket, use_tp)
        weights = self._tp_packed if use_tp else self.decode_params
        return fn(weights, logits, state, done, key)

    def kv_bucket_for(self, highest_write_pos: int) -> Optional[int]:
        """Smallest power-of-two cache window (>=512) covering the given
        write position; None when only the full cache fits. One compiled
        decode variant exists per distinct bucket (log2(max_seq) of them)."""
        b = 512
        while b < highest_write_pos + 1:
            b *= 2
        return b if b < self.max_seq_len else None

    def _get_chunk(self, n_steps, temperature, top_p, do_sample, eos,
                   kv_bucket=None, use_tp=False):
        sig = (n_steps, temperature, top_p, do_sample, eos, kv_bucket, use_tp)
        if sig in self._chunk_cache:
            return self._chunk_cache[sig]
        cfg = self.config

        if use_tp:
            # TP fused greedy chunk: like chunk_greedy below, but each step
            # is the shard_map'd per-layer kernel path. ``params`` is the
            # repack_for_tp tree (passed, never closed over — closures over
            # weights become HLO constants and blow up the remote compiler).
            from ..kernels import decode_layer_tp as _tp

            specs = self._tp_specs
            mesh = self.mesh
            tc = cfg.text_config

            @functools.partial(
                jax.jit, donate_argnums=(1, 2, 3),
                compiler_options=self._decode_jit_opts,
            )
            def chunk_greedy_tp(params, seed, state: KVState, done, key):
                token0 = (
                    jnp.argmax(seed, -1).astype(jnp.int32)
                    if seed.ndim == 2
                    else seed
                )

                def body(carry, _):
                    token, state, done = carry
                    token = jnp.where(done, eos, token)
                    done = done | (token == eos)
                    valid = state.valid.at[:, state.write_pos].set(True)
                    next_tok, cache = _tp.decode_step_greedy_tp(
                        params, specs, tc, token, state.cache,
                        cache_pos=state.write_pos, kv_valid=valid,
                        position_ids=state.pos_ids, kv_bucket=kv_bucket,
                        mesh=mesh,
                    )
                    new_state = KVState(cache, valid, state.write_pos + 1,
                                        state.pos_ids + 1)
                    return (next_tok, new_state, done), token

                (tok, state, done), tokens = jax.lax.scan(
                    body, (token0, state, done), None, length=n_steps
                )
                return tok, state, tokens.T, done

            self._chunk_cache[sig] = chunk_greedy_tp
            return chunk_greedy_tp

        if not do_sample and self._greedy_head_fused:
            # Greedy fast path: the fused head+argmax kernel returns the
            # token id directly, so the chunk carries a (B,) TOKEN instead
            # of (B, V) logits between steps and across chunks. The first
            # chunk still receives prefill logits (2-D seed -> argmax);
            # later chunks feed the returned token back in. Emitted tokens
            # are bit-identical to the sampling path at do_sample=False.
            @functools.partial(
                jax.jit, donate_argnums=(1, 2, 3),
                compiler_options=self._decode_jit_opts,
            )
            def chunk_greedy(params, seed, state: KVState, done, key):
                token0 = (
                    jnp.argmax(seed, -1).astype(jnp.int32)
                    if seed.ndim == 2
                    else seed
                )

                def body(carry, _):
                    token, state, done = carry
                    token = jnp.where(done, eos, token)
                    done = done | (token == eos)
                    valid = state.valid.at[:, state.write_pos].set(True)
                    next_tok, cache = paligemma.decode_step_greedy(
                        params, cfg, token, state.cache,
                        cache_pos=state.write_pos, kv_valid=valid,
                        position_ids=state.pos_ids, kv_bucket=kv_bucket,
                    )
                    new_state = KVState(cache, valid, state.write_pos + 1,
                                        state.pos_ids + 1)
                    return (next_tok, new_state, done), token

                (tok, state, done), tokens = jax.lax.scan(
                    body, (token0, state, done), None, length=n_steps
                )
                return tok, state, tokens.T, done

            self._chunk_cache[sig] = chunk_greedy
            return chunk_greedy

        @functools.partial(
            jax.jit, donate_argnums=(1, 2, 3),
            compiler_options=self._decode_jit_opts,
        )
        def chunk(params, logits, state: KVState, done, key):
            def body(carry, step_key):
                logits, state, done = carry
                token = sampling.sample(
                    step_key, logits, temperature, top_p, do_sample
                )
                token = jnp.where(done, eos, token)
                done = done | (token == eos)
                valid = state.valid.at[:, state.write_pos].set(True)
                new_logits, cache = paligemma.decode_step(
                    params, cfg, token, state.cache,
                    cache_pos=state.write_pos, kv_valid=valid,
                    position_ids=state.pos_ids, kv_bucket=kv_bucket,
                    scan_block=self.decode_scan_block,
                    fused_mlp=self.fused_mlp,
                    fused_layer=self.fused_layer,
                )
                new_state = KVState(cache, valid, state.write_pos + 1,
                                    state.pos_ids + 1)
                return (new_logits, new_state, done), token

            keys = jax.random.split(key, n_steps)
            (logits, state, done), tokens = jax.lax.scan(
                body, (logits, state, done), keys
            )
            return logits, state, tokens.T, done

        self._chunk_cache[sig] = chunk
        return chunk

    # ------------------------------------------------------------------
    def generate(
        self,
        pixel_values,
        input_ids,
        attention_mask,
        max_new_tokens: int = 100,
        temperature: float = 0.8,
        top_p: float = 0.9,
        do_sample: bool = False,
        key: Optional[jax.Array] = None,
        eos_token_id: Optional[int] = None,
        on_token=None,
        sync_every: int = 1,
    ) -> np.ndarray:
        """Reference-compatible generation loop (ref: inference.py:51-87).

        Returns (B, <=max_new_tokens) int32; rows stop contributing after EOS
        (post-EOS slots filled with EOS). ``on_token(step, tokens)`` is
        called per step for streaming consumers (the reference's per-token
        decode print, ref: inference.py:80-81).

        ``sync_every > 1`` runs that many decode steps per device dispatch
        (``decode_chunk``) and checks EOS on the host once per chunk —
        identical tokens, up to sync_every-1 wasted (discarded) steps after
        all rows hit EOS, and a large throughput win on tunneled devices.
        """
        eos = self.eos_token_id if eos_token_id is None else eos_token_id
        if input_ids.shape[1] + max_new_tokens > self.max_seq_len:
            raise ValueError(
                f"prompt ({input_ids.shape[1]}) + max_new_tokens "
                f"({max_new_tokens}) exceeds max_seq_len ({self.max_seq_len}); "
                "raise max_seq_len or lower max_new_tokens"
            )
        if key is None:
            key = jax.random.PRNGKey(0)
        logits, state = self.prefill(pixel_values, input_ids, attention_mask)
        b = input_ids.shape[0]

        if sync_every > 1:
            done = jnp.zeros((b,), bool)
            chunks = []
            emitted = 0
            prompt_len = input_ids.shape[1]
            while emitted < max_new_tokens:
                n = min(sync_every, max_new_tokens - emitted)
                key, sub = jax.random.split(key)
                logits, state, tokens, done = self.decode_chunk(
                    logits, state, n, temperature, top_p, do_sample,
                    key=sub, eos_token_id=eos, done=done,
                    kv_bucket=self.kv_bucket_for(prompt_len + emitted + n),
                )
                tokens_np = np.asarray(tokens)
                chunks.append(tokens_np)
                if on_token is not None:
                    for j in range(tokens_np.shape[1]):
                        on_token(emitted + j, tokens_np[:, j])
                emitted += n
                if np.asarray(done).all():
                    break
            return np.concatenate(chunks, axis=1)

        done = np.zeros((b,), bool)
        out = []
        for step in range(max_new_tokens):
            key, sub = jax.random.split(key)
            token = sampling.sample(sub, logits, temperature, top_p, do_sample)
            token_np = np.asarray(token)
            token_np = np.where(done, eos, token_np)
            out.append(token_np)
            if on_token is not None:
                on_token(step, token_np)
            done |= token_np == eos
            if done.all():
                break
            logits, state = self.decode_step(jnp.asarray(token_np), state)
        return np.stack(out, axis=1)

    # ------------------------------------------------------------------
    def generate_spec(
        self,
        pixel_values,
        input_ids,
        attention_mask,
        max_new_tokens: int = 100,
        eos_token_id: Optional[int] = None,
        draft_k: int = 8,
        match_n: int = 2,
        corrupt_frac: float = 0.0,
    ) -> np.ndarray:
        """Greedy generation with device-resident n-gram speculative
        decoding (prompt lookup). B == 1.

        ``corrupt_frac`` is a BENCHMARK-ONLY acceptance control: each draft
        position is deterministically replaced with an almost-surely-wrong
        token with that probability (on device, keyed by cycle), which
        dials mean acceptance between the n-gram matcher's natural rate
        and the zero-acceptance floor — the emitted tokens stay identical
        to greedy regardless (rejected positions fall back to the model's
        own argmax; that is the whole acceptance rule). Used by
        .bench/spec_acceptance_bench.py and bench.py to publish a measured
        tok/s-vs-acceptance curve instead of only the best-case bound.

        Decode is weight-bandwidth-bound: every step streams the full int8
        LM (~2.9 GB) to produce ONE token. Verifying ``draft_k`` proposed
        tokens in one multi-token forward (models/paligemma.decode_verify)
        costs the same weight stream, so each accepted draft token is a
        nearly-free extra token. Drafts come from the n-gram matcher
        (ops/ngram.py) run ON DEVICE inside the same jit — the whole
        propose/verify/accept loop is one ``lax.while_loop`` with zero
        host round trips (a host-side speculator would pay the ~35-40 ms
        tunnel readback per cycle, ten decode steps' worth).

        Tokens are IDENTICAL to greedy ``generate`` (acceptance compares
        the draft against the model's own argmax at every position; a
        rejected draft position falls back to the model's token, so a bad
        draft can never change the output). Measured at the 3B int8 b1
        bench shape (.bench/spec_decode_bench.py, 256 new tokens): a
        verify cycle costs ~6 ms vs the 3.44 ms fused single-token step
        (the k+1-token forward runs the XLA path with a pairwise mask),
        so break-even is ~0.75 accepted drafts/cycle; at near-full
        acceptance (repetitive outputs: looping captions, OCR read-outs,
        detection token streams) throughput reaches ~1090 tok/s vs 225
        end-to-end — ~4.8x — while the zero-acceptance floor is ~0.55x.
        Use it when outputs repeat; docs/PERFORMANCE.md "Speculative
        decoding". The reference decodes strictly one token per forward
        (ref: inference.py:51-87).
        """
        eos = self.eos_token_id if eos_token_id is None else eos_token_id
        b, prompt_len = input_ids.shape
        if b != 1:
            raise ValueError(
                "generate_spec is single-request (B == 1); rows accept "
                "different draft counts and would desync the lockstep "
                "write_pos. Use generate/decode_chunk for batches."
            )
        # rejected draft positions write (then-invalid) KV up to
        # write_pos + draft_k, so the cache must cover the overshoot
        if prompt_len + max_new_tokens + draft_k > self.max_seq_len:
            raise ValueError(
                f"prompt ({prompt_len}) + max_new_tokens ({max_new_tokens}) "
                f"+ draft_k ({draft_k}) exceeds max_seq_len "
                f"({self.max_seq_len}); speculative decode writes up to "
                "draft_k positions past the last accepted token"
            )
        logits, state = self.prefill(pixel_values, input_ids, attention_mask)
        history = np.zeros((1, self.max_seq_len), np.int32)
        history[0, :prompt_len] = np.asarray(input_ids)[0]
        kv_bucket = self.kv_bucket_for(prompt_len + max_new_tokens + draft_k)
        fn = self._get_spec(max_new_tokens, draft_k, match_n, eos, kv_bucket,
                            corrupt_frac=float(corrupt_frac))
        out, n_out, cycles, _ = fn(
            self.decode_params, logits, state, jnp.asarray(history),
            jnp.asarray([prompt_len], np.int32),
        )
        n = int(n_out)
        # observability: mean accepted-per-cycle == n / spec_cycles
        self.spec_cycles = int(cycles)
        return np.asarray(out)[None, :n]

    def _get_spec(self, max_new, draft_k, match_n, eos, kv_bucket=None,
                  corrupt_frac=0.0):
        sig = (max_new, draft_k, match_n, eos, kv_bucket, corrupt_frac)
        if sig in self._spec_cache:
            return self._spec_cache[sig]
        cfg = self.config
        k = draft_k
        vocab = cfg.text_config.vocab_size
        from ..ops.ngram import propose_ngram

        @functools.partial(
            jax.jit, donate_argnums=(2,),
            compiler_options=self._decode_jit_opts,
        )
        def spec(params, logits0, state: KVState, history, hist_len):
            token0 = jnp.argmax(logits0, -1).astype(jnp.int32)  # (1,)
            out = jnp.full((max_new,), eos, jnp.int32).at[0].set(token0[0])
            history = history.at[0, hist_len[0]].set(token0[0])
            hist_len = hist_len + 1
            j = jnp.arange(k + 1, dtype=jnp.int32)
            sidx = jnp.arange(state.valid.shape[1], dtype=jnp.int32)[None]

            def cond(c):
                _, _, _, _, n_out, done, _, _ = c
                return (~done) & (n_out < max_new)

            def body(c):
                state, history, hist_len, out, n_out, done, last_tok, cyc = c
                draft = propose_ngram(history, hist_len, match_n, k)  # (1,k)
                if corrupt_frac > 0.0:
                    # acceptance control (benchmark only): a corrupted
                    # position proposes a shifted token the verify argmax
                    # rejects (up to a ~1/vocab coincidence), keyed by
                    # cycle so the sequence is deterministic on device
                    ck = jax.random.fold_in(jax.random.PRNGKey(20260820), cyc)
                    u = jax.random.uniform(ck, (1, k))
                    draft = jnp.where(
                        u < corrupt_frac, (draft + 1) % vocab, draft
                    )
                tokens_in = jnp.concatenate([last_tok[:, None], draft], 1)
                logits, cache = paligemma.decode_verify(
                    params, cfg, tokens_in, state.cache, state.write_pos,
                    state.valid, state.pos_ids, kv_bucket=kv_bucket,
                )
                g = jnp.argmax(logits, -1).astype(jnp.int32)  # (1, k+1)
                # accept the longest prefix where draft matches the model's
                # own greedy choice; position n_acc gets the model's token
                # (free correction/bonus)
                acc = jnp.cumprod(
                    (draft == g[:, :k]).astype(jnp.int32), axis=1
                )
                n_acc = jnp.sum(acc[0])
                draft_pad = jnp.concatenate(
                    [draft[0], jnp.zeros((1,), jnp.int32)]
                )
                cand = jnp.where(j < n_acc, draft_pad, g[0, n_acc])
                n_emit = jnp.minimum(n_acc + 1, max_new - n_out)
                is_eos = (cand == eos) & (j < n_emit)
                any_eos = jnp.any(is_eos)
                n_keep = jnp.where(any_eos, jnp.argmax(is_eos) + 1, n_emit)
                # out-of-range targets are dropped, so only [0, n_keep) land
                tgt = jnp.where(j < n_keep, n_out + j, max_new + 1)
                out = out.at[tgt].set(cand, mode="drop")
                tgt_h = jnp.where(
                    j < n_keep, hist_len[0] + j, history.shape[1] + 1
                )
                history = history.at[0, tgt_h].set(cand, mode="drop")
                hist_len = hist_len + n_keep
                # only ACCEPTED slots become attendable; the k - n_acc
                # rejected writes stay invalid and are overwritten by the
                # next cycle (which starts at write_pos + n_keep)
                valid = state.valid | (
                    (sidx >= state.write_pos)
                    & (sidx < state.write_pos + n_keep)
                )
                state = KVState(
                    cache, valid, state.write_pos + n_keep,
                    state.pos_ids + n_keep,
                )
                last_tok = cand[n_keep - 1][None]
                return (state, history, hist_len, out, n_out + n_keep,
                        done | any_eos, last_tok, cyc + 1)

            init = (state, history, hist_len, out, jnp.asarray(1, jnp.int32),
                    token0[0] == eos, token0, jnp.asarray(0, jnp.int32))
            state, history, hist_len, out, n_out, done, _, cyc = (
                jax.lax.while_loop(cond, body, init)
            )
            return out, n_out, cyc, done

        self._spec_cache[sig] = spec
        return spec

    # ------------------------------------------------------------------
    def generate_fused(
        self,
        pixel_values,
        input_ids,
        attention_mask,
        max_new_tokens: int,
        temperature: float = 0.8,
        top_p: float = 0.9,
        do_sample: bool = False,
        key: Optional[jax.Array] = None,
        eos_token_id: Optional[int] = None,
    ):
        """Entire prefill + decode loop under jit (for serving/benchmarks)."""
        eos = self.eos_token_id if eos_token_id is None else eos_token_id
        if input_ids.shape[1] + max_new_tokens > self.max_seq_len:
            raise ValueError(
                f"prompt ({input_ids.shape[1]}) + max_new_tokens "
                f"({max_new_tokens}) exceeds max_seq_len ({self.max_seq_len}); "
                "raise max_seq_len or lower max_new_tokens"
            )
        if key is None:
            key = jax.random.PRNGKey(0)
        fn = self._get_fused(max_new_tokens, temperature, top_p, do_sample, eos)
        cache = self.init_state_cache(input_ids.shape[0])
        return fn(self.params, self.decode_params, pixel_values, input_ids,
                  attention_mask, cache, key)

    def _get_fused(self, max_new_tokens, temperature, top_p, do_sample, eos):
        sig = (max_new_tokens, temperature, top_p, do_sample, eos)
        if sig in self._fused_cache:
            return self._fused_cache[sig]
        cfg = self.config
        prefill_fn = self._prefill_fn
        decode_scan_block = self.decode_scan_block

        @jax.jit
        def fused(params, decode_params, pixels, ids, mask, cache, key):
            logits, state = prefill_fn(params, pixels, ids, mask, cache)
            b = ids.shape[0]

            def body(carry, step_key):
                logits, state, done = carry
                token = sampling.sample(step_key, logits, temperature, top_p, do_sample)
                token = jnp.where(done, eos, token)
                done = done | (token == eos)
                valid = state.valid.at[:, state.write_pos].set(True)
                new_logits, new_cache = paligemma.decode_step(
                    decode_params, cfg, token, state.cache,
                    cache_pos=state.write_pos, kv_valid=valid,
                    position_ids=state.pos_ids,
                    scan_block=decode_scan_block,
                    fused_mlp=self.fused_mlp,
                    fused_layer=self.fused_layer,
                )
                new_state = KVState(new_cache, valid, state.write_pos + 1,
                                    state.pos_ids + 1)
                return (new_logits, new_state, done), token

            keys = jax.random.split(key, max_new_tokens)
            (_, _, done), tokens = jax.lax.scan(
                body, (logits, state, jnp.zeros((b,), bool)), keys
            )
            return tokens.T  # (B, max_new_tokens)

        self._fused_cache[sig] = fused
        return fused
