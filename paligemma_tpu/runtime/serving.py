"""Continuous-batching serving engine.

The reference serves exactly one request at a time with a hard B==1 assert
(ref: processing_paligemma.py:174, inference.py:69). This engine keeps a
fixed pool of sequence slots over a shared preallocated KV cache and runs
one jitted lockstep decode over all active slots per tick:

* ``submit`` queues a request (ids + pixels + sampling params);
* free slots are filled by single-request prefills whose KV is scattered
  into the slot's cache rows;
* every ``step()`` decodes one token for every active slot (per-row cache
  positions and RoPE positions — sequences are at different lengths);
* rows retire on EOS or length budget and their slots are immediately
  reusable — no head-of-line blocking on long generations.

All shapes are static (max_slots, max_seq_len) so nothing recompiles as
requests come and go. Works with bf16 or int8-quantized (runtime.quantize)
parameters.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PaliGemmaConfig
from ..models import gemma, paligemma
from ..ops import sampling


@dataclasses.dataclass
class Request:
    request_id: int
    input_ids: np.ndarray  # (S,) int32
    pixel_values: np.ndarray  # (C, H, W)
    max_new_tokens: int = 100
    temperature: float = 0.8
    top_p: float = 0.9
    do_sample: bool = False
    eos_token_id: int = 1
    # multi-LoRA serving: name of the adapter to decode this request with
    # (must exist in the engine's lora_bank; None = the base model)
    lora: Optional[str] = None
    # constrained decoding: name of the grammar this request's output must
    # match (must exist in the engine's grammars; None = unconstrained)
    grammar: Optional[str] = None
    # streaming: host-side callback invoked with each ACCEPTED token id as
    # the scheduler absorbs it (window granularity — up to sync_every
    # tokens arrive per burst; discarded overshoot never reaches it).
    # Set programmatically (the HTTP server's SSE path), not via JSON.
    on_token: Optional[Any] = None
    # engine-stamped wall-clock marks (time.perf_counter seconds):
    # submit -> seated (prefill done) -> first token absorbed -> finished.
    # TTFT here includes queueing and the sync_every readback lag — the
    # honest number a client would see, not the bare prefill time.
    t_submit: Optional[float] = None
    t_seated: Optional[float] = None
    t_first_token: Optional[float] = None
    t_finished: Optional[float] = None

    def metrics(self) -> Dict[str, Any]:
        """Latency/throughput summary (None until finished)."""
        if self.t_finished is None or self.t_submit is None:
            return {}
        decode_s = self.t_finished - self.t_first_token
        return {
            "queue_ms": round((self.t_seated - self.t_submit) * 1e3, 1),
            "ttft_ms": round((self.t_first_token - self.t_submit) * 1e3, 1),
            "total_ms": round((self.t_finished - self.t_submit) * 1e3, 1),
            "decode_tokens_per_sec": (
                round((len(self.tokens) - 1) / decode_s, 1)
                if decode_s > 0 and len(self.tokens) > 1 else None
            ),
        }
    # filled by the engine
    tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    # engine-managed: bidirectional-prefix length for recompute prefills
    # (set on preemption to the ORIGINAL prompt length; None = whole prompt)
    prefix_len: Optional[int] = None
    # engine-managed: bumped on preemption so in-flight pipelined windows
    # dispatched before the eviction are discarded, not double-counted
    epoch: int = 0


@dataclasses.dataclass
class _Window:
    """One dispatched-but-not-synced decode window (pipelined scheduling)."""
    tokens_dev: Any  # (ticks, max_slots) int32 device array — NOT synced
    ticks: int
    # (request, epoch-at-dispatch) per slot; None for empty/inactive rows
    snapshot: List[Optional[tuple]]
    # speculative windows: (ticks, max_slots) int32 accepted-count array
    # (tokens_dev is then (ticks, max_slots, draft_k+1); row t emits its
    # first counts[t, slot] entries). None for ordinary 1-token/tick windows.
    counts_dev: Any = None


class ServingEngine:
    def __init__(
        self,
        params: Dict[str, Any],
        config: PaliGemmaConfig,
        max_slots: int = 8,
        max_seq_len: int = 1024,
        cache_dtype=None,
        use_flash: Optional[bool] = None,
        decode_params: Optional[Dict[str, Any]] = None,
        sync_every: int = 8,
        mesh=None,
        fused_decode: Optional[bool] = None,
        pipeline: Optional[bool] = None,
        spec_decode: bool = False,
        spec_draft_k: int = 8,
        spec_match_n: int = 2,
        spec_corrupt_frac: float = 0.0,  # benchmark-only acceptance dial
        lora_bank: Optional[Dict[str, Any]] = None,
        grammars: Optional[Dict[str, Any]] = None,
        prefix_cache: bool = False,
        prefix_cache_entries: int = 8,
        int8_act_prefill: bool = False,
    ):
        """``decode_params``: optional int8-quantized weights used for the
        lockstep decode while ``params`` (bf16) serves the prefills.

        ``sync_every``: decode ticks per host synchronization. Each host
        readback costs a full device round trip (expensive through a
        tunneled TPU); batching K ticks amortizes it. EOS detection lags by
        up to K-1 tokens — the overshoot tokens are discarded.

        ``pipeline``: overlap the host readback with device compute —
        ``run_to_completion`` dispatches window N+1 BEFORE synchronizing
        window N's tokens, so the device never idles through the ~35 ms
        tunnel round trip a readback costs here. Window sizing uses
        DISPATCHED token counts, so budgets never overrun; the cost is one
        extra window of EOS-detection lag (up to ``2*sync_every - 1``
        overshoot tokens, discarded) and one window of slot-reuse latency.
        Default: on when the backend is a TPU, off for CPU tests.

        ``mesh``: optional tensor-parallel Mesh("data","model") with
        data == 1 (the slot pool is the batch; requests shard over "model"
        via the weights). This is the BASELINE "int8 continuous-batched
        serving sharded over chips" configuration. Pure TP is deliberate:
        lockstep decode is HBM-bandwidth-bound, and TP shards the weight
        stream across chips (aggregate bandwidth scales with the axis),
        whereas a data axis would *replicate* the weights and re-read them
        once per data shard every tick — more slots but zero per-token
        speedup and N x the HBM footprint. Scale slot count with
        ``max_slots`` (lockstep decode is batch-cheap) instead."""
        if mesh is not None:
            self._check_mesh(mesh)
            from jax.sharding import NamedSharding

            from ..core import mesh as mesh_lib

            params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                params, mesh_lib.param_specs(params),
            )
            if decode_params is not None:
                decode_params = jax.tree.map(
                    lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                    decode_params, mesh_lib.param_specs(decode_params),
                )
        self.mesh = mesh
        self.params = params
        self.decode_params = decode_params if decode_params is not None else params
        # W8A8 prefill (int8 weights + dynamic per-row int8 activations on
        # the MXU, ~1.5x the bf16-convert dot at prefill shapes) — only
        # meaningful when ``params`` IS the int8 tree; decode ticks and the
        # logits head keep the exact convert path (matmul_any row gate)
        self.int8_act_prefill = bool(int8_act_prefill)

        # Fused decode kernels (kernels/decode_layer + decode_head): the
        # lockstep tick runs all layers in one Pallas call and, for greedy
        # rows, the head streams through a running argmax — state carries
        # per-slot next-token ids, so sampling requests still work (they
        # read fresh logits from the XLA sampling variant; greedy tokens
        # never read state["logits"]).
        if fused_decode is None:
            fused_decode = jax.default_backend() == "tpu"
        if spec_decode:
            # the verify forward is a multi-token XLA step (the fused
            # kernels are single-token); skip the layer repack entirely
            fused_decode = False
        # Multi-LoRA serving: requests name an adapter (Request.lora) and
        # every prefill/decode forward applies each ROW's adapter via the
        # per-row bank gather in gemma._lora_delta — one compiled tick
        # serves any base/adapter mix (bank row 0 is the all-zero base
        # adapter). The bank rides jit args, never closures (big-constant
        # rule, CLAUDE.md). The rank-r deltas are ~2% extra HBM traffic,
        # but the tick takes the XLA path — the fused kernels don't know
        # adapters (the delta needs per-layer activations the
        # grid-over-layers kernel never exposes).
        self.lora_bank = None
        self._lora_index: Dict[Optional[str], int] = {None: 0}
        if lora_bank:
            if spec_decode:
                raise ValueError(
                    "spec_decode + lora_bank is unimplemented (the verify "
                    "forward doesn't thread adapters yet)"
                )
            from ..train.lora import stack_lora_bank

            names = list(lora_bank)
            bank = stack_lora_bank([lora_bank[n] for n in names])
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                bank = jax.tree.map(
                    lambda x: jax.device_put(
                        x, NamedSharding(mesh, PartitionSpec())
                    ),
                    bank,
                )
            self.lora_bank = bank
            self._lora_index.update(
                {n: i + 1 for i, n in enumerate(names)}
            )
            if mesh is not None:
                # TP/DP lora serving stays on the GSPMD XLA tick; the
                # single-chip fused tick applies adapters IN-KERNEL via
                # the concat-basis pack (built below after the repack)
                fused_decode = False
        # Grammar-constrained decoding: requests name a compiled grammar
        # (processing/grammar.py TokenDFA) and the tick masks each ROW's
        # logits with that grammar's allowed-token row before every
        # selection, advancing a per-row DFA state on device — constraint
        # enforcement is one (B, vocab) gather + where per step, zero host
        # round trips. Grammar id 0 = unconstrained (all-zero table: every
        # token allowed, state stays 0), so mixed batches need no branch.
        self.grammar_table = None
        self._grammar_index: Dict[Optional[str], int] = {None: 0}
        self._grammars = grammars or {}
        if grammars:
            v = config.vocab_size
            s_max = max(g.num_states for g in grammars.values())
            tables = [np.zeros((s_max, v), np.int16)]  # gid 0: unconstrained
            for i, (name, g) in enumerate(grammars.items()):
                if g.table.shape[1] != v:
                    raise ValueError(
                        f"grammar {name!r} compiled for vocab "
                        f"{g.table.shape[1]}, model has {v}"
                    )
                t = np.full((s_max, v), -1, np.int16)
                t[: g.num_states] = g.table
                tables.append(t)
                self._grammar_index[name] = i + 1
            gt = jnp.asarray(np.stack(tables))
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                gt = jax.device_put(gt, NamedSharding(mesh, PartitionSpec()))
            self.grammar_table = gt
            fused_decode = False
        self._tp_packed = self._tp_specs = None
        if fused_decode and mesh is not None:
            # mesh serving: the fused tick is the tensor-parallel variant
            # (kernels/decode_layer_tp) — per-layer kernels per shard with
            # the o/down psums riding ICI between kernel calls
            from ..kernels import decode_layer_tp as _tp

            tc0 = config.text_config
            layers = self.decode_params["lm"]["layers"]
            fused_decode = (
                _tp.supported(tc0, mesh, layers, batch=max_slots)
                and "head_q" in self.decode_params["lm"]
            )
            if fused_decode:
                self._tp_packed, self._tp_specs = _tp.repack_for_tp(
                    self.decode_params["lm"], tc0, mesh
                )
        elif fused_decode:
            from ..kernels import decode_layer as _dl
            from ..kernels import decode_mlp as _dm

            layers = self.decode_params["lm"]["layers"]
            tc0 = config.text_config
            fused_decode = (
                tc0.num_key_value_heads == 1
                and tc0.head_dim % 128 == 0
                and isinstance(layers["attn"].get("qkv"), dict)
                and _dm.supported(layers["mlp"])
                and max_slots <= 32
            )
            if fused_decode:
                from ..kernels import decode_head as _dh

                dp = dict(self.decode_params)
                dp["lm"] = dict(dp["lm"])
                dp["lm"]["layers"] = jax.jit(_dl.repack_layers)(
                    dp["lm"]["layers"]
                )
                if "head_q" in dp["lm"]:
                    dp["lm"]["head_q"] = jax.jit(_dh.repack_head)(
                        dp["lm"]["head_q"]
                    )
                self.decode_params = dp
        self.fused_decode = fused_decode
        self._lora_fused_pack = None
        if fused_decode and self.lora_bank is not None:
            # in-kernel multi-LoRA: the concat-basis blocks stream next
            # to the base weights inside the grid-over-layers kernel
            from ..kernels import decode_layer as _dl2

            tc0 = config.text_config
            gate_blk = self.decode_params["lm"]["layers"]["mlp"]["gate_blk"]
            _, nc0, _, bs0 = gate_blk.shape
            # eager (one-time, bank-sized): keeps "rank"/"g_true" static
            self._lora_fused_pack = _dl2.repack_lora_bank_fused(
                self.lora_bank["layers"], nc=nc0, bs=bs0,
                n_heads=tc0.num_attention_heads,
                head_dim=tc0.head_dim, hidden=tc0.hidden_size,
            )
        # Speculative continuous batching (greedy-only): every decode window
        # becomes a scan of verify CYCLES — per row, the device-resident
        # n-gram proposer (ops/ngram.py) drafts spec_draft_k tokens and ONE
        # multi-token forward (models/paligemma.decode_verify, per-row
        # cache positions) verifies them, so each cycle emits 1..draft_k+1
        # tokens per row for one weight stream. Rows accept independently:
        # per-row write_pos/valid/history advance by that row's accepted
        # count, and a per-row device-side budget counter deactivates rows
        # exactly at max_new_tokens (the host can't know accepted counts
        # until it syncs). Tokens are bit-identical to the non-speculative
        # greedy engine — acceptance compares each draft against the
        # model's own argmax. Opt-in and workload-dependent: a verify cycle
        # costs more than a 1-token fused tick, so it wins when outputs
        # repeat (OCR/detection streams, JSON grammars, looping captions)
        # and loses at zero acceptance (docs/PERFORMANCE.md "Speculative
        # decoding"). Requires do_sample=False on every request (rejected
        # at submit). The reference decodes strictly one token per forward
        # (ref: inference.py:51-87).
        # Under a mesh the verify forward shards like the non-fused tick:
        # decode_verify is plain XLA, decode weights carry Megatron
        # NamedShardings (device_put above), and GSPMD inserts the psums —
        # state/cache stay replicated (MQA KV). Parity:
        # tests/test_spec_serving.py::test_spec_serving_under_tp_mesh.
        self.spec_decode = spec_decode
        self.spec_draft_k = spec_draft_k
        self.spec_match_n = spec_match_n
        self.spec_corrupt_frac = float(spec_corrupt_frac)
        self.config = config
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len
        self.cache_dtype = cache_dtype or params["lm"]["embed"].dtype
        if use_flash is None:
            use_flash = jax.default_backend() == "tpu"
        if use_flash and mesh is not None:
            # flash prefill runs under the TP mesh via shard_map (query heads
            # on "model"); fall back to XLA attention only for head counts
            # the head sharding cannot express
            hq = config.text_config.num_attention_heads
            hkv = config.text_config.num_key_value_heads
            m = mesh.shape["model"]
            ok_lm = hq % m == 0 and (hkv % m == 0 or (hq // m) % hkv == 0)
            ok_vis = config.vision_config.num_attention_heads % m == 0
            if not (ok_lm and ok_vis):
                use_flash = False
        self.use_flash = use_flash

        cfg = config
        tcfg = config.text_config

        _i8a = self.int8_act_prefill

        @functools.partial(jax.jit, donate_argnums=(5,))
        def _prefill_batch(params, pixels, ids, mask, prefix_lens, cache1,
                           lora=None, adapter_ids=None):
            # pending requests in the same length bucket prefill as ONE call
            logits, cache1 = paligemma.prefill(
                params, cfg, pixels, ids, mask, cache1, use_flash=use_flash,
                last_only=True, mesh=mesh if use_flash else None,
                prefix_lens=prefix_lens, lora=lora, adapter_ids=adapter_ids,
                int8_act=_i8a,
            )
            return logits[:, 0], cache1

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def _insert_batch(slots, prompt_lens, cache, state, cache1, mask1,
                          last_logits, ids1=None, max_news=None,
                          adapters=None, gids=None, gtable=None):
            # seat the WHOLE prefill wave in one dispatch: row r of the
            # batched prefill goes to pool slot slots[r]. One scatter per
            # K/V slab + vectorized per-slot state, replacing round 3's
            # per-row dispatches (R jit calls per wave, each re-copying
            # the non-donated state logits)
            R = slots.shape[0]
            cache = {
                n: cache[n].at[:, slots].set(cache1[n].astype(cache[n].dtype))
                for n in ("k", "v")
            }
            mask_b = mask1.astype(bool)  # (R, bucket)
            valid_rows = (
                jnp.zeros((R, self.max_seq_len), bool)
                .at[:, : mask1.shape[1]].set(mask_b)
            )
            if gtable is not None:
                # first pending tokens are selected from the grammar's
                # START state (dstate stays 0 — it advances when the tick
                # consumes the token); stored logits stay UNMASKED, the
                # sampling variant re-masks with each row's live state
                allowed0 = gtable[gids, 0] >= 0  # (R, vocab)
                next_toks = jnp.argmax(
                    jnp.where(allowed0, last_logits, -jnp.inf), -1
                ).astype(jnp.int32)
            else:
                next_toks = jnp.argmax(last_logits, -1).astype(jnp.int32)
            state = {
                **state,
                "valid": state["valid"].at[slots].set(valid_rows),
                "write_pos": state["write_pos"].at[slots].set(prompt_lens),
                "pos_ids": state["pos_ids"].at[slots].set(
                    jnp.sum(mask1, -1).astype(jnp.int32) + 1
                ),
                "logits": state["logits"].at[slots].set(last_logits),
                "next_tok": state["next_tok"].at[slots].set(next_toks),
            }
            if lora_bank:
                state = {
                    **state,
                    "adapter": state["adapter"].at[slots].set(adapters),
                }
            if gtable is not None:
                state = {
                    **state,
                    "gid": state["gid"].at[slots].set(gids),
                    "dstate": state["dstate"].at[slots].set(
                        jnp.zeros_like(gids)
                    ),
                }
            if spec_decode:
                # seed each row's n-gram history (prompt then, at position
                # prompt_len, the not-yet-emitted next token — the proposer
                # matches the trailing suffix through the newest known
                # token) and the device-side remaining-budget counter
                hist = (
                    jnp.zeros((R, self.max_seq_len), jnp.int32)
                    .at[:, : ids1.shape[1]].set(ids1.astype(jnp.int32))
                )
                hist = hist.at[jnp.arange(R), prompt_lens].set(next_toks)
                state = {
                    **state,
                    "hist": state["hist"].at[slots].set(hist),
                    "left": state["left"].at[slots].set(max_news),
                }
            return cache, state

        # -- dense prefix cache (exact-match; see prefix_cache docstring) --
        @functools.partial(jax.jit, donate_argnums=(0,))
        def _seat_cached_kv(cache, ek, ev, slot):
            # dense rows are contiguous: ONE dynamic_update_slice per slab
            # copies the whole cached (L, 1, S, nkv, d) row into the slot
            zero = jnp.zeros((), jnp.int32)
            idx = (zero, slot, zero, zero, zero)
            return {
                "k": jax.lax.dynamic_update_slice(
                    cache["k"], ek.astype(cache["k"].dtype), idx
                ),
                "v": jax.lax.dynamic_update_slice(
                    cache["v"], ev.astype(cache["v"].dtype), idx
                ),
            }

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _seat_cached_state(state, slot, prompt_len, logits_row,
                               ids1=None, max_new=None, adapter=None,
                               gid=None, gtable=None):
            # mirror of _insert_batch's per-row state writes, driven from a
            # stored last-logits row instead of a fresh prefill
            valid_row = (
                jnp.arange(self.max_seq_len, dtype=jnp.int32) < prompt_len
            )
            if gtable is not None and gid is not None:
                allowed0 = gtable[gid, 0] >= 0
                next_tok = jnp.argmax(
                    jnp.where(allowed0, logits_row, -jnp.inf), -1
                ).astype(jnp.int32)
            else:
                next_tok = jnp.argmax(logits_row, -1).astype(jnp.int32)
            state = {
                **state,
                "valid": state["valid"].at[slot].set(valid_row),
                "write_pos": state["write_pos"].at[slot].set(prompt_len),
                "pos_ids": state["pos_ids"].at[slot].set(prompt_len + 1),
                "logits": state["logits"].at[slot].set(logits_row),
                "next_tok": state["next_tok"].at[slot].set(next_tok),
            }
            if adapter is not None:
                state = {
                    **state,
                    "adapter": state["adapter"].at[slot].set(adapter),
                }
            if gid is not None:
                state = {
                    **state,
                    "gid": state["gid"].at[slot].set(gid),
                    "dstate": state["dstate"].at[slot].set(0),
                }
            if spec_decode:
                # a hit skips the prefill that normally seeds the proposer —
                # seed the history from the request's own ids (compiles once
                # per distinct prompt length, like prefill)
                zero = jnp.zeros((), jnp.int32)
                hist_row = jnp.zeros((self.max_seq_len,), jnp.int32)
                hist_row = jax.lax.dynamic_update_slice(
                    hist_row, ids1[0].astype(jnp.int32), (zero,)
                )
                hist_row = hist_row.at[prompt_len].set(next_tok)
                state = {
                    **state,
                    "hist": state["hist"].at[slot].set(hist_row),
                    "left": state["left"].at[slot].set(max_new),
                }
            return state

        @jax.jit
        def _extract_entry(cache1k, cache1v, last_logits, row):
            ek = jax.lax.dynamic_slice_in_dim(cache1k, row, 1, axis=1)
            ev = jax.lax.dynamic_slice_in_dim(cache1v, row, 1, axis=1)
            lg = jax.lax.dynamic_slice_in_dim(last_logits, row, 1, axis=0)[0]
            return ek, ev, lg

        self._seat_cached_kv = _seat_cached_kv
        self._seat_cached_state = _seat_cached_state
        self._extract_entry = _extract_entry

        def _tick(params, tp_packed, cache, state, active, key, temps,
                  top_ps, do_samples, with_sampling=False,
                  kv_bucket=None, lora=None, gtable=None):
            # greedy tokens come from the carried next-token ids — exact
            # regardless of whether the previous tick materialized logits
            # (grammar engines pre-masked them at selection time)
            greedy_tok = state["next_tok"]
            if with_sampling:
                # full-vocab sort per sampled row — only compiled in when
                # some active request actually samples. Sampled rows' logits
                # are fresh: every tick they were active ran this variant.
                logits = state["logits"]
                if gtable is not None:
                    # constrain the sampled choice to the row's live DFA
                    # state (stored logits are unmasked by convention)
                    allowed = gtable[state["gid"], state["dstate"]] >= 0
                    logits = jnp.where(allowed, logits, -jnp.inf)
                sampled_tok = jax.vmap(
                    lambda k, lg, t, p: sampling.sample_top_p(k, lg[None], t, p)[0]
                )(jax.random.split(key, self.max_slots), logits, temps, top_ps)
                token = jnp.where(do_samples, sampled_tok, greedy_tok)
            else:
                token = greedy_tok

            dstate = None
            if gtable is not None:
                # advance each row's DFA by the token being consumed; rows
                # that are inactive (or emitting stale post-budget tokens)
                # hold their state
                nxt_state = gtable[
                    state["gid"], state["dstate"], token
                ].astype(jnp.int32)
                dstate = jnp.where(active, nxt_state, state["dstate"])

            write_pos = state["write_pos"]
            valid = state["valid"].at[jnp.arange(self.max_slots), write_pos].set(
                active
            )
            inc = active.astype(jnp.int32)
            if not with_sampling and self.fused_decode:
                # fused greedy tick: one grid-over-layers kernel + fused
                # head/argmax; the (slots, 257k) logits never materialize.
                # Under a mesh the TP per-layer kernels run instead.
                if tp_packed is not None:
                    from ..kernels import decode_layer_tp as _tp

                    next_tok, cache = _tp.decode_step_greedy_tp(
                        tp_packed, self._tp_specs, tcfg, token, cache,
                        cache_pos=write_pos, kv_valid=valid,
                        position_ids=state["pos_ids"], kv_bucket=kv_bucket,
                        mesh=mesh,
                    )
                else:
                    next_tok, cache = paligemma.decode_step_greedy(
                        params, cfg, token, cache,
                        cache_pos=write_pos, kv_valid=valid,
                        position_ids=state["pos_ids"], kv_bucket=kv_bucket,
                        lora=lora,
                        adapter_ids=(
                            state["adapter"] if lora is not None else None
                        ),
                    )
                state = {
                    **state,  # preserves "adapter" (multi-LoRA) if present
                    "valid": valid,
                    "write_pos": write_pos + inc,
                    "pos_ids": state["pos_ids"] + inc,
                    "logits": state["logits"],  # stale; greedy never reads
                    "next_tok": jnp.where(active, next_tok, state["next_tok"]),
                }
                return token, cache, state
            new_logits, cache = paligemma.decode_step(
                params, cfg, token, cache,
                cache_pos=write_pos, kv_valid=valid,
                position_ids=state["pos_ids"], kv_bucket=kv_bucket,
                fused_layer=self.fused_decode,
                lora=lora,
                adapter_ids=state["adapter"] if lora is not None else None,
            )
            sel_logits = new_logits
            if gtable is not None:
                # the NEXT pending greedy token is selected under the
                # just-advanced DFA state's mask (logits stored unmasked)
                allowed2 = gtable[state["gid"], dstate] >= 0
                sel_logits = jnp.where(allowed2, new_logits, -jnp.inf)
            state = {
                **state,  # preserves "adapter"/"gid" extras if present
                "valid": valid,
                "write_pos": write_pos + inc,
                "pos_ids": state["pos_ids"] + inc,
                "logits": jnp.where(active[:, None], new_logits, state["logits"]),
                "next_tok": jnp.where(
                    active,
                    jnp.argmax(sel_logits, -1).astype(jnp.int32),
                    state["next_tok"],
                ),
            }
            if dstate is not None:
                state["dstate"] = dstate
            return token, cache, state

        @functools.partial(
            jax.jit, donate_argnums=(2, 3),
            static_argnames=("ticks", "with_sampling", "kv_bucket"),
        )
        def _decode_window(params, tp_packed, cache, state, lefts, key,
                           temps, top_ps, do_samples, lora=None,
                           gtable=None, ticks=1,
                           with_sampling=False, kv_bucket=None):
            """``ticks`` lockstep decode steps in ONE dispatch (lax.scan).

            Dispatching tick-by-tick costs a jit dispatch + a host-side key
            split per token through the tunnel; the scan makes a whole
            window one device program. ``lefts`` is each row's remaining
            DISPATCH budget — a row deactivates itself mid-window when its
            budget runs out (its write_pos stops advancing; the stale
            tokens it keeps emitting are discarded by ``_absorb``'s budget
            check), so one compiled window shape serves every budget mix.
            Returns the advanced PRNG key so the host never splits."""
            key, *tick_keys = jax.random.split(key, ticks + 1)

            def body(carry, k):
                cache, state, lefts = carry
                token, cache, state = _tick(
                    params, tp_packed, cache, state, lefts > 0, k, temps,
                    top_ps, do_samples, with_sampling=with_sampling,
                    kv_bucket=kv_bucket, lora=lora, gtable=gtable,
                )
                return (cache, state, jnp.maximum(lefts - 1, 0)), token

            (cache, state, _), tokens = jax.lax.scan(
                body, (cache, state, lefts), jnp.stack(tick_keys)
            )
            return tokens, cache, state, key

        kd = spec_draft_k

        @functools.partial(
            jax.jit, donate_argnums=(1, 2),
            static_argnames=("ticks", "kv_bucket"),
        )
        def _spec_window(params, cache, state, gtable=None, ticks=1,
                         kv_bucket=None):
            """``ticks`` speculative verify cycles in ONE dispatch.

            Each cycle per row: propose ``kd`` n-gram drafts, verify
            [next_tok, drafts] in one (B, kd+1)-token forward, accept the
            longest prefix matching the model's own argmax. The cycle emits
            that accepted prefix OF THE INPUTS (1..kd+1 tokens — next_tok
            plus the verified drafts; the model's correction token becomes
            the next cycle's next_tok, mirroring the engine's emit-the-
            pre-forward-token convention). Rejected positions' KV stays
            invalid and is overwritten by the next cycle. Rows deactivate
            themselves when their device-side budget (state["left"])
            runs out — with variable per-cycle emission the host cannot
            pre-charge budgets the way ``_decode_window``'s lefts do.

            Grammar rows (``gtable``): the DFA advances through the cycle's
            input tokens on device, and every verify position's argmax is
            masked with the state reached AFTER its prefix — a disallowed
            draft can never equal the masked argmax, so the acceptance rule
            rejects exactly there and the emitted stream stays token-
            identical to non-spec constrained greedy decoding. gid 0 rows
            (unconstrained) see an all-allowed table, so mixed batches need
            no branch.

            Returns ((ticks, B, kd+1) tokens, (ticks, B) counts, ...)."""
            from ..ops.ngram import propose_ngram

            j = jnp.arange(kd + 1, dtype=jnp.int32)[None]  # (1, kd+1)
            sidx = jnp.arange(self.max_seq_len, dtype=jnp.int32)[None]
            rows = jnp.arange(self.max_slots, dtype=jnp.int32)

            def body(carry, _):
                cache, state = carry
                left = state["left"]
                active = left > 0
                wp = state["write_pos"]
                draft = propose_ngram(
                    state["hist"], wp + 1, spec_match_n, kd
                )  # (B, kd)
                if self.spec_corrupt_frac > 0.0:
                    # benchmark-only acceptance dial (see engine
                    # generate_spec corrupt_frac): corrupted positions
                    # propose a shifted token the verify argmax rejects,
                    # keyed by the summed write positions (deterministic,
                    # on device); emitted tokens stay greedy-identical
                    ck = jax.random.fold_in(
                        jax.random.PRNGKey(20260820), jnp.sum(wp)
                    )
                    u = jax.random.uniform(ck, draft.shape)
                    draft = jnp.where(
                        u < self.spec_corrupt_frac,
                        (draft + 1) % cfg.text_config.vocab_size, draft,
                    )
                tokens_in = jnp.concatenate(
                    [state["next_tok"][:, None], draft], axis=1
                )  # (B, kd+1)
                logits, cache = paligemma.decode_verify(
                    params, cfg, tokens_in, cache, cache_pos=wp,
                    kv_valid=state["valid"], position_ids=state["pos_ids"],
                    kv_bucket=kv_bucket,
                )
                dstates = None
                if gtable is not None:
                    # s_{i+1} = state after consuming tokens_in[:, :i+1],
                    # starting from the live dstate (= state BEFORE
                    # next_tok, the tick invariant). Unrolled: kd+1 tiny
                    # (B,) gathers. A disallowed transition yields -1;
                    # clamp for the gather — positions past the first
                    # rejection never matter (acceptance stops before).
                    s = state["dstate"]
                    states = []  # s_1 .. s_{kd+1}
                    for i in range(kd + 1):
                        s = gtable[
                            state["gid"], jnp.maximum(s, 0),
                            tokens_in[:, i],
                        ].astype(jnp.int32)
                        states.append(s)
                    dstates = jnp.stack(states, axis=1)  # (B, kd+1)
                    # verify position i selects the token FOLLOWING
                    # tokens_in[:, i] -> masked by allowed(s_{i+1})
                    allowed = (
                        gtable[
                            state["gid"][:, None],
                            jnp.maximum(dstates, 0),
                        ] >= 0
                    )  # (B, kd+1, V)
                    logits = jnp.where(allowed, logits, -jnp.inf)
                g = jnp.argmax(logits, -1).astype(jnp.int32)  # (B, kd+1)
                n_acc = jnp.sum(
                    jnp.cumprod((draft == g[:, :kd]).astype(jnp.int32), 1), 1
                )
                n_keep = jnp.where(
                    active, jnp.minimum(n_acc + 1, left), 0
                )  # (B,) emitted this cycle
                valid = state["valid"] | (
                    (sidx >= wp[:, None]) & (sidx < (wp + n_keep)[:, None])
                )
                # model token after the last kept input -> next cycle's seed
                nxt = jnp.take_along_axis(
                    g, jnp.maximum(n_keep - 1, 0)[:, None], axis=1
                )[:, 0]
                nxt = jnp.where(active, nxt, state["next_tok"])
                # history: kept drafts at wp+1.., then the new seed token
                # (out-of-range targets drop — inactive rows write nothing)
                tgt_d = jnp.where(
                    (j[:, :kd] < (n_keep - 1)[:, None]) & active[:, None],
                    wp[:, None] + 1 + j[:, :kd], self.max_seq_len + 1,
                )
                hist = state["hist"].at[rows[:, None], tgt_d].set(
                    draft, mode="drop"
                )
                tgt_n = jnp.where(active, wp + n_keep, self.max_seq_len + 1)
                hist = hist.at[rows, tgt_n].set(nxt, mode="drop")
                new_state = {
                    "next_tok": nxt,
                    "valid": valid,
                    "write_pos": wp + n_keep,
                    "pos_ids": state["pos_ids"] + n_keep,
                    "logits": state["logits"],  # stale; spec is greedy-only
                    "hist": hist,
                    "left": left - n_keep,
                }
                if gtable is not None:
                    # dstate' = state after the n_keep EMITTED tokens (all
                    # masked-valid, so no -1 on that prefix); rows emitting
                    # nothing hold their state
                    s_kept = jnp.take_along_axis(
                        dstates, jnp.maximum(n_keep - 1, 0)[:, None], axis=1
                    )[:, 0]
                    new_state["gid"] = state["gid"]
                    new_state["dstate"] = jnp.where(
                        n_keep > 0, s_kept, state["dstate"]
                    )
                state = new_state
                out = jnp.where(j < n_keep[:, None], tokens_in, 0)
                return (cache, state), (out, n_keep)

            (cache, state), (tokens, counts) = jax.lax.scan(
                body, (cache, state), None, length=ticks
            )
            return tokens, counts, cache, state

        self._prefill_batch = _prefill_batch
        self._insert_batch = _insert_batch
        self._decode_window = _decode_window
        self._spec_window = _spec_window

        # Dense exact-match prefix cache (round 4): same key semantics as
        # the paged engine's (byte-identical ids + pixels [+ adapter];
        # PaliGemma's bidirectional prefix rules out partial reuse), but
        # entries are standalone KV COPIES — one full (L, 1, S, nkv, d)
        # row pair per entry (the dense cache has no page sharing), seated
        # by a single dynamic_update_slice per slab. A hit skips the
        # prefill entirely; same-wave duplicates coalesce via _wave_key.
        # LRU at capacity; entries cost one slot-row of KV HBM each.
        if not hasattr(self, "prefix_cache"):  # paged subclass set its own
            self.prefix_cache = prefix_cache
            self.prefix_cache_entries = prefix_cache_entries
        if not hasattr(self, "cache_hits"):
            self.cache_hits = 0  # observability: prefills skipped
        from collections import OrderedDict as _OD

        self._dense_pcache: "Dict[bytes, Dict[str, Any]]" = _OD()

        self.cache = self._init_cache()
        self.state = self._zero_state()
        self.slots: List[Optional[Request]] = [None] * max_slots
        self.pending: List[Request] = []
        self._key = jax.random.PRNGKey(0)
        self._generated: Dict[int, int] = {}  # absorbed (synced) tokens
        self._dispatched: Dict[int, int] = {}  # dispatched (incl. in-flight)
        self.prefill_calls = 0  # observability: batched prefill dispatches
        self.sync_every = max(1, sync_every)
        if pipeline is None:
            pipeline = jax.default_backend() == "tpu"
        self.pipeline = pipeline
        self._sched_cache = None  # (fingerprint, device arrays)
        # prefill prompt-length bucket granularity: compiled (batch, bucket)
        # shape count trades against pad waste; the paged engine overrides
        # this with its page size so buckets stay page-aligned
        self._bucket_gran = 64

    def _init_cache(self):
        """Allocate the KV backend (hook — paged allocates a page pool)."""
        return gemma.init_kv_cache(
            self.config.text_config, self.max_slots, self.max_seq_len,
            self.cache_dtype,
        )

    def _kv_bucket(self, highest_write_pos: int):
        """Smallest power-of-two cache window (>=512) covering the position;
        None = full cache (see gemma._decoder_block kv_bucket)."""
        b = 512
        while b < highest_write_pos + 1:
            b *= 2
        return b if b < self.max_seq_len else None

    def _zero_state(self) -> Dict[str, jnp.ndarray]:
        state = {
            "next_tok": jnp.zeros((self.max_slots,), jnp.int32),
            "valid": jnp.zeros((self.max_slots, self.max_seq_len), bool),
            "write_pos": jnp.zeros((self.max_slots,), jnp.int32),
            "pos_ids": jnp.ones((self.max_slots,), jnp.int32),
            "logits": jnp.zeros(
                (self.max_slots, self.config.vocab_size), jnp.float32
            ),
        }
        if getattr(self, "spec_decode", False):
            # per-row n-gram history (prompt + emitted + the pending seed
            # token) and the device-side remaining-budget counter — rows
            # deactivate themselves mid-window when theirs reaches zero
            state["hist"] = jnp.zeros(
                (self.max_slots, self.max_seq_len), jnp.int32
            )
            state["left"] = jnp.zeros((self.max_slots,), jnp.int32)
        if getattr(self, "lora_bank", None) is not None:
            # per-row adapter index into the bank (0 = base/zero adapter)
            state["adapter"] = jnp.zeros((self.max_slots,), jnp.int32)
        if getattr(self, "grammar_table", None) is not None:
            # per-row grammar id (0 = unconstrained) + live DFA state
            state["gid"] = jnp.zeros((self.max_slots,), jnp.int32)
            state["dstate"] = jnp.zeros((self.max_slots,), jnp.int32)
        return state

    def warmup(self, prompt_lens, batch_sizes=(1, 2, 4, 8),
               sampling: bool = False) -> None:
        """Pre-compile every jit the serving loop hits — prefill for the
        expected (batch, length-bucket) shapes, the per-row cache insert,
        and the lockstep decode tick — so the first real wave pays zero
        XLA compiles. ``prompt_lens``: representative prompt lengths
        (token counts incl. image tokens); ``sampling=True`` additionally
        compiles the top-p decode variant."""
        g = self._bucket_gran
        buckets = sorted({
            min(((s + g - 1) // g) * g, self.max_seq_len) for s in prompt_lens
        })
        c = self.config.vision_config
        last_logits = None
        for bucket in buckets:
            for n in batch_sizes:
                if n > self.max_slots:
                    continue
                ids = np.zeros((n, bucket), np.int32)
                ids[:, 0] = self.config.image_token_index
                mask = np.ones((n, bucket), np.int32)
                cache1 = gemma.init_kv_cache(
                    self.config.text_config, n, self.max_seq_len,
                    self.cache_dtype,
                )
                pixels = np.zeros((n, 3, c.image_size, c.image_size), np.float32)
                lora_kw = (
                    dict(lora=self.lora_bank,
                         adapter_ids=jnp.zeros((n,), jnp.int32))
                    if self.lora_bank is not None else {}
                )
                last_logits, cache1 = self._prefill_batch(
                    self.params, jnp.asarray(pixels), jnp.asarray(ids),
                    jnp.asarray(mask), jnp.full((n,), bucket, np.int32),
                    cache1, **lora_kw,
                )
                # _insert_batch compiles per prefill-batch shape; run it on
                # throwaway pool buffers (donated args) with the real shapes
                scratch_cache = gemma.init_kv_cache(
                    self.config.text_config, self.max_slots, self.max_seq_len,
                    self.cache_dtype,
                )
                scratch_state = self._zero_state()
                mask1 = jnp.asarray(np.ones((n, bucket), np.int32))
                extra = (
                    dict(ids1=jnp.asarray(ids),
                         max_news=jnp.ones((n,), jnp.int32))
                    if self.spec_decode else {}
                )
                if self.lora_bank is not None:
                    extra["adapters"] = jnp.zeros((n,), jnp.int32)
                if self.grammar_table is not None:
                    extra["gids"] = jnp.zeros((n,), jnp.int32)
                    extra["gtable"] = self.grammar_table
                self._insert_batch(
                    jnp.arange(n, dtype=jnp.int32) % self.max_slots,
                    jnp.full((n,), bucket, jnp.int32),
                    scratch_cache, scratch_state,
                    cache1, mask1, last_logits, **extra,
                )
        # decode window: compiles once per (ticks, with_sampling, kv_bucket)
        # variant; the scheduler only ever uses ticks == sync_every (steady
        # state) and ticks == 1 (tail), so warm both at the kv bucket the
        # first wave will hit
        if self.spec_decode:
            # every window is a spec window (greedy-only engine)
            w = self.sync_every * (self.spec_draft_k + 1)
            kv_bucket = self._kv_bucket(
                max(buckets, default=0)
                + w * (2 if self.pipeline else 1) + self.spec_draft_k
            )
            for ticks in sorted({1, self.sync_every}):
                scratch_cache = gemma.init_kv_cache(
                    self.config.text_config, self.max_slots, self.max_seq_len,
                    self.cache_dtype,
                )
                self._spec_window(
                    self.decode_params, scratch_cache, self._zero_state(),
                    gtable=self.grammar_table, ticks=ticks,
                    kv_bucket=kv_bucket,
                )
            return
        variants = (False, True) if sampling else (False,)
        kv_bucket = self._kv_bucket(max(buckets, default=0) + self.sync_every)
        for with_sampling in variants:
            for ticks in sorted({1, self.sync_every}):
                scratch_cache = gemma.init_kv_cache(
                    self.config.text_config, self.max_slots, self.max_seq_len,
                    self.cache_dtype,
                )
                scratch_state = self._zero_state()
                zeros_f = jnp.zeros((self.max_slots,), jnp.float32)
                self._decode_window(
                    self.decode_params, self._tp_packed, scratch_cache,
                    scratch_state, jnp.zeros((self.max_slots,), jnp.int32),
                    jax.random.PRNGKey(0), zeros_f + 1.0, zeros_f + 1.0,
                    jnp.zeros((self.max_slots,), bool),
                    lora=self._lora_arg(), gtable=self.grammar_table,
                    ticks=ticks, with_sampling=with_sampling,
                    kv_bucket=kv_bucket,
                )

    # ------------------------------------------------------------------
    def submit(self, req: Request) -> None:
        """Queue a request. Rejects (raises) over-long prompts here, at the
        submission boundary, so one bad request can't crash the scheduler
        loop mid-``step()`` for everyone else."""
        budget = self.max_seq_len - 1  # >= 1 decode slot must remain
        if len(req.input_ids) > budget:
            raise ValueError(
                f"request {req.request_id}: prompt of {len(req.input_ids)} "
                f"tokens exceeds the per-slot budget ({budget} = max_seq_len "
                f"{self.max_seq_len} - 1 decode slot)"
            )
        # clamp generation so prompt + generated never writes past
        # max_seq_len: an uncapped request would wrap write_pos//page_size
        # past the page table (paged) or the dense cache end and silently
        # corrupt an interior KV slot
        req.max_new_tokens = min(
            req.max_new_tokens, self.max_seq_len - len(req.input_ids)
        )
        if req.lora is not None and req.lora not in self._lora_index:
            known = sorted(k for k in self._lora_index if k is not None)
            raise ValueError(
                f"request {req.request_id}: unknown LoRA adapter "
                f"{req.lora!r} (engine has {known or 'no adapters'}; pass "
                "lora_bank={name: adapter_tree} at construction)"
            )
        if req.grammar is not None:
            if req.grammar not in self._grammar_index:
                known = sorted(
                    k for k in self._grammar_index if k is not None
                )
                raise ValueError(
                    f"request {req.request_id}: unknown grammar "
                    f"{req.grammar!r} (engine has {known or 'no grammars'}; "
                    "pass grammars={name: TokenDFA} at construction)"
                )
            g_eos = self._grammars[req.grammar].eos_token_id
            if req.eos_token_id != g_eos:
                raise ValueError(
                    f"request {req.request_id}: grammar {req.grammar!r} "
                    f"was compiled with eos_token_id {g_eos} but the "
                    f"request stops on {req.eos_token_id} — a completed "
                    "match could never retire the row"
                )
        if getattr(self, "spec_decode", False):
            if req.do_sample:
                raise ValueError(
                    f"request {req.request_id}: spec_decode serving is "
                    "greedy-only (acceptance compares drafts against the "
                    "model's argmax; a sampled row would need stochastic "
                    "verification). Submit with do_sample=False or use a "
                    "non-speculative engine."
                )
            # a verify cycle writes KV up to draft_k positions past the
            # last accepted token; keep the overshoot inside the cache
            req.max_new_tokens = min(
                req.max_new_tokens,
                self.max_seq_len - len(req.input_ids) - self.spec_draft_k,
            )
            if req.max_new_tokens < 1:
                raise ValueError(
                    f"request {req.request_id}: prompt of "
                    f"{len(req.input_ids)} tokens leaves no generation room "
                    f"under spec_decode (draft_k={self.spec_draft_k} "
                    f"overshoot must fit in max_seq_len {self.max_seq_len})"
                )
        req.t_submit = time.perf_counter()
        self.pending.append(req)

    def cancel(self, request_id: int) -> bool:
        """Cancel a queued or in-flight request. Returns True if anything
        was cancelled (False: unknown id or already finished).

        Purely host-side: a seated request's slot frees immediately (pages
        released, pool row reusable by the next admission) and its epoch
        bump makes any already-dispatched pipelined window discard the
        row's tokens at absorb — no device work is interrupted (the row
        keeps decoding garbage until the in-flight window drains, exactly
        like a preemption). ``req.tokens`` keeps whatever was accepted
        before the cancel."""
        for i, req in enumerate(self.pending):
            if req.request_id == request_id:
                del self.pending[i]
                req.done = True
                return True
        for slot, req in enumerate(self.slots):
            if req is not None and req.request_id == request_id:
                req.done = True
                req.epoch += 1  # in-flight windows discard at absorb
                self.slots[slot] = None
                self._release_slot(slot)
                return True
        return False

    def _bucket_of(self, req: Request) -> int:
        g = self._bucket_gran
        return min(((len(req.input_ids) + g - 1) // g) * g, self.max_seq_len)

    def _admit(self, free_slots: list) -> List[Request]:
        """Pick pending requests to admit this round (backend hook — the
        paged engine caps admission by free pages too). FIFO; removes the
        taken requests from ``pending``."""
        take = self.pending[: len(free_slots)]
        del self.pending[: len(take)]
        return take

    def _take_slot(self, free: list, req: Request) -> int:
        """Pop the slot ``req`` will occupy from ``free`` (backend hook —
        the data-parallel paged engine pins each admitted request to the
        shard whose page budget covered it in ``_admit``)."""
        return free.pop(0)

    def _check_mesh(self, mesh) -> None:
        """Mesh-contract hook. The dense engine is pure TP: slots are the
        batch and a data axis would replicate the weight stream for zero
        per-token speedup (see __init__ docstring). The paged engine
        overrides this — it shards slots AND the page pool over "data"."""
        assert mesh.shape["data"] == 1, (
            "serving mesh must be pure TP (data=1); slots are the batch"
        )

    def _insert_chunk(self, seated, cache1, mask, last_logits,
                      ids1=None) -> None:
        """Seat one prefill chunk — row ``r`` of the batched prefill goes to
        pool slot ``seated[r][0]`` — in a SINGLE device dispatch (backend
        hook; the paged engine overrides with page-wise writes). Replaces
        round 3's per-row scatters: R jit calls per wave, each re-copying
        the non-donated prefill cache."""
        extra = {}
        if self.spec_decode:
            extra = dict(
                ids1=ids1,
                max_news=jnp.asarray(
                    [req.max_new_tokens for _, req in seated], jnp.int32
                ),
            )
        if self.lora_bank is not None:
            extra["adapters"] = jnp.asarray(
                [self._lora_index[req.lora] for _, req in seated], jnp.int32
            )
        if self.grammar_table is not None:
            extra["gids"] = jnp.asarray(
                [self._grammar_index[req.grammar] for _, req in seated],
                jnp.int32,
            )
            extra["gtable"] = self.grammar_table
        if self.prefix_cache:
            # register BEFORE _insert_batch donates the pool buffers
            # (cache1/last_logits stay live — the extract copies rows out)
            for r, (slot, req) in enumerate(seated):
                key = self._pcache_key(req)
                if key is None or key in self._dense_pcache:
                    continue
                ek, ev, lg = self._extract_entry(
                    cache1["k"], cache1["v"], last_logits,
                    jnp.asarray(r, jnp.int32),
                )
                self._dense_pcache[key] = dict(
                    k=ek, v=ev, logits=lg, prompt_len=len(req.input_ids)
                )
                while len(self._dense_pcache) > self.prefix_cache_entries:
                    self._dense_pcache.popitem(last=False)  # LRU
        self.cache, self.state = self._insert_batch(
            jnp.asarray([slot for slot, _ in seated], jnp.int32),
            jnp.asarray([len(req.input_ids) for _, req in seated], jnp.int32),
            self.cache, self.state, cache1, mask, last_logits, **extra,
        )

    def _release_slot(self, slot: int) -> None:
        """Called when a request retires (backend hook — paged frees pages)."""

    def _pcache_key(self, req: Request) -> Optional[bytes]:
        """Exact-match prefix-cache key, or None when uncacheable. Shared
        with the paged engine: byte-identical (ids, pixels) — PaliGemma's
        bidirectional prefix (ref: modeling_paligemma.py:149-169) rules
        out partial reuse — plus the adapter name (prefix KV is computed
        THROUGH the adapter's prefill deltas)."""
        if not self.prefix_cache or req.prefix_len is not None:
            # recompute requests (prompt + regenerated tokens) are not
            # cacheable: their suffix was produced causally
            return None
        import hashlib

        h = hashlib.sha1()
        h.update(np.asarray(req.input_ids, np.int32).tobytes())
        h.update(np.ascontiguousarray(
            np.asarray(req.pixel_values, np.float32)).tobytes())
        if req.lora is not None:
            h.update(req.lora.encode())
        return h.digest()

    def _insert_cached(self, slot: int, req: Request) -> bool:
        """Fast-insert hook: seat ``req`` in ``slot`` WITHOUT a prefill.
        Dense implementation: copy the entry's KV row into the slot and
        rebuild the slot's scheduler state from the stored logits. The
        paged engine overrides with zero-copy page borrowing."""
        key = self._pcache_key(req)
        entry = self._dense_pcache.get(key) if key is not None else None
        if entry is None:
            return False
        assert entry["prompt_len"] == len(req.input_ids)  # sha1(ids)
        self.cache = self._seat_cached_kv(
            self.cache, entry["k"], entry["v"], jnp.asarray(slot, jnp.int32)
        )
        extra = {}
        if self.spec_decode:
            extra = dict(
                ids1=jnp.asarray(np.asarray(req.input_ids, np.int32)[None]),
                max_new=jnp.asarray(req.max_new_tokens, jnp.int32),
            )
        if self.lora_bank is not None:
            extra["adapter"] = jnp.asarray(
                self._lora_index[req.lora], jnp.int32
            )
        if self.grammar_table is not None:
            extra["gid"] = jnp.asarray(
                self._grammar_index[req.grammar], jnp.int32
            )
            extra["gtable"] = self.grammar_table
        self.state = self._seat_cached_state(
            self.state, jnp.asarray(slot, jnp.int32),
            jnp.asarray(entry["prompt_len"], jnp.int32), entry["logits"],
            **extra,
        )
        self._dense_pcache.move_to_end(key)
        self.cache_hits += 1
        return True

    def _wave_key(self, req: Request):
        """Same-wave dedup key (backend hook). When two requests admitted in
        ONE wave return the same non-None key, the second defers a pass: the
        first (the leader) prefills and registers its prefix-cache entry,
        then the follower seats from that entry via ``_insert_cached`` —
        N identical popular-query requests submitted together cost ONE
        prefill row instead of N. ``None`` (the default) never coalesces."""
        return self._pcache_key(req) if self.prefix_cache else None

    def _fill_slots(self) -> None:
        free = [i for i in range(self.max_slots) if self.slots[i] is None]
        if not free or not self.pending:
            return
        take = self._admit(free)
        if not take:
            return
        assigned = [(self._take_slot(free, req), req) for req in take]
        while assigned:
            # cache hits seat immediately (no prefill); same-wave duplicates
            # of a request that is ABOUT to prefill defer one pass and seat
            # from its freshly-registered entry on the next loop iteration
            need_prefill, deferred = [], []
            leaders = set()
            for slot, req in assigned:
                if self._insert_cached(slot, req):
                    self.slots[slot] = req
                    req.t_seated = time.perf_counter()
                    self._generated[req.request_id] = 0
                    self._dispatched[req.request_id] = 0
                    continue
                key = self._wave_key(req)
                if key is not None and key in leaders:
                    deferred.append((slot, req))
                    continue
                if key is not None:
                    leaders.add(key)
                need_prefill.append((slot, req))
            self._prefill_wave(need_prefill)
            # a deferred follower whose leader failed to register (e.g. no
            # room for the entry) re-enters here, becomes its own leader,
            # and prefills — each iteration makes progress
            assigned = deferred

    def _prefill_wave(self, need_prefill: list) -> None:
        if not need_prefill:
            return
        # group by prompt-length bucket, then split each group into exact
        # power-of-two chunks (16+4+1 for 21) — compiled (batch, bucket)
        # shapes stay the pow2 set WITHOUT the pad-to-pow2 row replication
        # that round 3 paid (a 21-request wave prefilled 32 rows: +52%
        # prefill compute, the driver bench's paged-vs-dense gap)
        groups: Dict[int, list] = {}
        for slot, req in need_prefill:
            bucket = self._bucket_of(req)
            groups.setdefault(bucket, []).append((slot, req))

        chunks: list = []
        for bucket, seated in groups.items():
            while seated:
                take = 1 << (len(seated).bit_length() - 1)  # largest pow2 <=
                chunks.append((bucket, seated[:take]))
                seated = seated[take:]
        for bucket, seated in chunks:
            n = len(seated)
            ids_np = np.zeros((n, bucket), np.int32)
            mask_np = np.zeros((n, bucket), np.int32)
            pfx_np = np.zeros((n,), np.int32)
            pix_np = np.zeros((n,) + tuple(seated[0][1].pixel_values.shape),
                              np.float32)
            for r, (_, req) in enumerate(seated):
                s = len(req.input_ids)
                ids_np[r, :s] = req.input_ids
                mask_np[r, :s] = 1
                pfx_np[r] = s if req.prefix_len is None else req.prefix_len
                pix_np[r] = req.pixel_values

            mask = jnp.asarray(mask_np)
            ids_j = jnp.asarray(ids_np)
            cache1 = gemma.init_kv_cache(
                self.config.text_config, n, self.max_seq_len, self.cache_dtype
            )
            lora_kw = {}
            if self.lora_bank is not None:
                aids_np = np.asarray(
                    [self._lora_index[req.lora] for _, req in seated],
                    np.int32,
                )
                lora_kw = dict(lora=self.lora_bank,
                               adapter_ids=jnp.asarray(aids_np))
            last_logits, cache1 = self._prefill_batch(
                self.params, jnp.asarray(pix_np), ids_j, mask,
                jnp.asarray(pfx_np), cache1, **lora_kw,
            )
            self.prefill_calls += 1
            self._insert_chunk(seated, cache1, mask, last_logits, ids1=ids_j)
            for slot, req in seated:
                self.slots[slot] = req
                req.t_seated = time.perf_counter()
                self._generated[req.request_id] = 0
                self._dispatched[req.request_id] = 0

    def _lora_arg(self):
        """Bank arg for decode windows: carries the fused-kernel pack so
        the tick keeps the grid-over-layers kernel (in-kernel adapters);
        rides jit ARGS, never closures (big-constant rule)."""
        if self.lora_bank is None:
            return None
        if getattr(self, "_lora_fused_pack", None) is not None:
            return {**self.lora_bank, "__fused_pack__": self._lora_fused_pack}
        return self.lora_bank

    @property
    def has_work(self) -> bool:
        return bool(self.pending) or any(r is not None for r in self.slots)

    def _before_window(self, ticks: int) -> None:
        """Backend hook run before each decode window, after admission —
        the paged engine grows page allocations here (and may preempt)."""

    def _run_window(self, ticks: int, lefts, temps_j, top_j, do_j,
                    with_sampling: bool) -> jnp.ndarray:
        """One scan-jitted dispatch covering ``ticks`` lockstep decode
        steps; returns the (ticks, max_slots) token DEVICE array without
        synchronizing — the caller decides when to pay the readback.
        Backend hook."""
        # static attended-cache window covering every active slot's write
        # positions for this window (host-side bookkeeping: prompt length +
        # tokens DISPATCHED so far) — one compiled tick per power-of-two
        kv_bucket = self._kv_bucket(
            max(
                (len(r.input_ids) + self._dispatched[r.request_id]
                 for r in self.slots if r is not None),
                default=0,
            ) + ticks
        )
        tokens, self.cache, self.state, self._key = self._decode_window(
            self.decode_params, self._tp_packed, self.cache, self.state,
            lefts, self._key, temps_j, top_j, do_j, lora=self._lora_arg(),
            gtable=self.grammar_table,
            ticks=ticks, with_sampling=with_sampling, kv_bucket=kv_bucket,
        )
        return tokens

    def _run_spec_window(self, ticks: int):
        """One scan-jitted dispatch of ``ticks`` speculative verify cycles.
        Returns ((ticks, slots, draft_k+1) tokens, (ticks, slots) counts)
        un-synced. The attended window must cover the worst-case in-window
        advance — every cycle can accept draft_k+1 tokens and writes
        draft_k past the last accepted one — plus one whole in-flight
        window of host-bookkeeping lag under pipelining (accepted counts
        are unknown to the host until it syncs)."""
        per_window = ticks * (self.spec_draft_k + 1)
        lag = per_window if self.pipeline else 0
        kv_bucket = self._kv_bucket(
            max(
                (len(r.input_ids) + self._generated[r.request_id]
                 for r in self.slots if r is not None),
                default=0,
            ) + per_window + lag + self.spec_draft_k
        )
        tokens, counts, self.cache, self.state = self._spec_window(
            self.decode_params, self.cache, self.state,
            gtable=self.grammar_table, ticks=ticks, kv_bucket=kv_bucket,
        )
        return tokens, counts

    def _dispatch(self) -> Optional[_Window]:
        """Fill free slots, size one decode window from DISPATCHED budgets,
        and enqueue it on the device. Returns the un-synced window (or None
        when no slot can decode). Per-row remaining budgets ride into the
        window (rows self-deactivate mid-window when theirs runs out), so a
        pipelined lookahead window can never overrun a budget or write past
        max_seq_len. ``ticks`` is either ``sync_every`` (steady state) or 1
        (tail windows) — exactly two compiled window shapes per kv bucket."""
        self._fill_slots()
        if self.spec_decode:
            return self._dispatch_spec()

        def _lefts():
            return [
                r.max_new_tokens - self._dispatched[r.request_id]
                if r is not None else 0
                for r in self.slots
            ]

        maxleft = max(_lefts(), default=0)
        if maxleft <= 0:
            return None
        ticks = self.sync_every if maxleft >= self.sync_every else 1
        self._before_window(ticks)  # may retire/preempt slots (paged)

        # recompute after _before_window: preemption changes the slot set
        lefts = _lefts()
        active_np = np.asarray([l > 0 for l in lefts])
        if not active_np.any():
            return None
        # device copies of the per-request sampling arrays, re-uploaded only
        # when the slot composition changes (host->device transfers are
        # expensive on tunneled platforms); the tiny lefts vector uploads
        # fresh each window
        fingerprint = tuple(r.request_id if r else None for r in self.slots)
        if self._sched_cache is None or self._sched_cache[0] != fingerprint:
            temps = np.asarray(
                [r.temperature if r else 1.0 for r in self.slots], np.float32
            )
            top_ps = np.asarray(
                [r.top_p if r else 1.0 for r in self.slots], np.float32
            )
            do_s = np.asarray(
                [bool(r.do_sample) if r else False for r in self.slots]
            )
            self._sched_cache = (
                fingerprint,
                (jnp.asarray(temps), jnp.asarray(top_ps), jnp.asarray(do_s)),
            )
        temps_j, top_j, do_j = self._sched_cache[1]
        with_sampling = any(
            r is not None and r.do_sample for r in self.slots
        )
        charges = [min(ticks, max(l, 0)) for l in lefts]
        tokens_dev = self._run_window(
            ticks, jnp.asarray(np.asarray(charges, np.int32)),
            temps_j, top_j, do_j, with_sampling,
        )
        snapshot: List[Optional[tuple]] = []
        for slot, req in enumerate(self.slots):
            if req is not None and charges[slot] > 0:
                self._dispatched[req.request_id] += charges[slot]
                snapshot.append((req, req.epoch))
            else:
                snapshot.append(None)
        return _Window(tokens_dev, ticks, snapshot)

    def _dispatch_spec(self) -> Optional[_Window]:
        """Speculative ``_dispatch``: budgets live ON DEVICE (state["left"],
        set at insert) because per-cycle emission is data-dependent — the
        host sizes windows from SYNCED counts (``_generated``), which under
        pipelining lag one window. A lagged dispatch for rows that already
        exhausted their device budget is harmless: their cycles emit count
        0 and the absorb of the in-flight window retires them."""

        def _lefts():
            return [
                r.max_new_tokens - self._generated[r.request_id]
                if r is not None else 0
                for r in self.slots
            ]

        maxleft = max(_lefts(), default=0)
        if maxleft <= 0:
            return None
        ticks = self.sync_every if maxleft >= self.sync_every else 1
        # a spec window can advance up to ticks*(draft_k+1) tokens and the
        # last cycle writes draft_k rejected-KV positions past that — the
        # paged backend's page growth must cover the whole worst case
        per_window = ticks * (self.spec_draft_k + 1)
        self._before_window(per_window + self.spec_draft_k)
        lefts = _lefts()
        if not any(l > 0 for l in lefts):
            return None
        tokens_dev, counts_dev = self._run_spec_window(ticks)
        snapshot: List[Optional[tuple]] = [
            (req, req.epoch) if req is not None and lefts[slot] > 0 else None
            for slot, req in enumerate(self.slots)
        ]
        for slot, req in enumerate(self.slots):
            # worst-case DISPATCHED bookkeeping: the host can't know
            # accepted counts until sync, so page growth and bucket sizing
            # assume every cycle accepts fully (capped by the budget)
            if req is not None and lefts[slot] > 0:
                self._dispatched[req.request_id] = min(
                    req.max_new_tokens,
                    self._dispatched[req.request_id] + per_window,
                )
        return _Window(tokens_dev, ticks, snapshot, counts_dev=counts_dev)

    def _absorb(self, window: _Window) -> List[Request]:
        """Synchronize one dispatched window's tokens (the only host
        readback) and run retirement bookkeeping. Tokens for requests that
        retired or were preempted after dispatch are discarded."""
        token_np = np.asarray(window.tokens_dev)
        counts_np = (
            None if window.counts_dev is None
            else np.asarray(window.counts_dev)
        )
        finished: List[Request] = []
        for slot, snap in enumerate(window.snapshot):
            if snap is None:
                continue
            req, epoch = snap
            if req.done or req.epoch != epoch or self.slots[slot] is not req:
                continue  # retired/preempted since dispatch — discard
            if counts_np is None:
                toks = [int(token_np[t, slot]) for t in range(window.ticks)]
            else:
                # speculative window: cycle t emitted its first
                # counts[t, slot] entries (accepted prefix of that cycle)
                toks = [
                    int(token_np[t, slot, i])
                    for t in range(window.ticks)
                    for i in range(int(counts_np[t, slot]))
                ]
            now = time.perf_counter()
            for tok in toks:
                req.tokens.append(tok)
                if req.t_first_token is None:
                    req.t_first_token = now
                if req.on_token is not None:
                    req.on_token(tok)
                self._generated[req.request_id] += 1
                out_of_budget = (
                    self._generated[req.request_id] >= req.max_new_tokens
                    or len(req.input_ids) + self._generated[req.request_id]
                    >= self.max_seq_len
                )
                if tok == req.eos_token_id or out_of_budget:
                    req.done = True
                    req.t_finished = now
                    finished.append(req)
                    self.slots[slot] = None
                    self._release_slot(slot)
                    break  # overshoot tokens within the window are discarded
        return finished

    def step(self) -> List[Request]:
        """One scheduler tick: fill free slots, decode one window for every
        active slot, retire finished requests. Returns newly finished ones.
        Unpipelined — dispatch and absorb back-to-back (the HTTP server's
        latency-oriented loop)."""
        window = self._dispatch()
        return self._absorb(window) if window is not None else []

    def run_to_completion(self, pipeline: Optional[bool] = None) -> List[Request]:
        """Drain the queue. With ``pipeline`` (default: the engine's
        ``pipeline`` attribute), window N+1 is dispatched BEFORE window N's
        tokens are read back, overlapping the host sync with device compute
        — per-request results are identical (greedy tokens depend only on
        each request's own prompt); only retirement/admission latency shifts
        by one window."""
        if pipeline is None:
            pipeline = self.pipeline
        done: List[Request] = []
        if not pipeline:
            while self.has_work:
                done.extend(self.step())
            return done
        inflight: Optional[_Window] = None
        while self.has_work or inflight is not None:
            window = self._dispatch() if self.has_work else None
            if inflight is not None:
                done.extend(self._absorb(inflight))
            elif window is None and self.has_work:
                # nothing dispatchable and nothing in flight (e.g. the head
                # of the queue cannot be admitted yet) — fall back to the
                # stepwise path for one round to make progress or surface
                # the stall the same way the unpipelined loop would
                done.extend(self.step())
            inflight = window
        return done
