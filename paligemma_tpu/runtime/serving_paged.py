"""Paged continuous-batching engine: the slot-pool scheduler over a shared
KV page pool instead of a ``max_slots x max_seq_len`` reservation.

Same scheduler and request contract as ``ServingEngine`` (submit / step /
run_to_completion, lockstep decode, length-bucketed grouped prefills,
amortized host syncs) — only the KV backend differs:

* KV lives in fixed-size pages drawn from ONE pool
  ``(L, n_pages, page_size, n_kv, d)``; a request holds exactly
  ``ceil(len/page_size)`` pages and grows one page at a time while
  decoding. HBM scales with *live tokens*, not worst-case length — so the
  same reservation serves far more slots (VERDICT r1 item 9).
* decode attention is the Pallas paged kernel
  (kernels/paged_attention.py); off-TPU the XLA gather fallback keeps
  tests runnable.
* admission: FIFO until either slots or pages run out (no skip-ahead, so
  long prompts can't be starved).
* preemption: if the pool can't cover the next decode window, the
  youngest active request is evicted — its pages are freed and it re-enters
  the queue front as a recompute request (prompt + tokens so far), the
  vLLM recompute strategy. Guarantees forward progress for the oldest
  request as long as the pool covers ONE request.

The reference serves exactly one request at a time over a torch.cat
Python-list cache (ref: processing_paligemma.py:174, inference.py:69,
modeling_gemma.py:8-64) — paging has no analog there at all.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PaliGemmaConfig
from ..models import paligemma
from ..ops import sampling
from .paged_cache import PagedKVCache
from .serving import Request, ServingEngine


class PagedServingEngine(ServingEngine):
    def __init__(
        self,
        params: Dict[str, Any],
        config: PaliGemmaConfig,
        max_slots: int = 16,
        max_seq_len: int = 1024,
        page_size: int = 64,
        n_pages: Optional[int] = None,
        cache_dtype=None,
        use_flash: Optional[bool] = None,
        decode_params: Optional[Dict[str, Any]] = None,
        sync_every: int = 8,
        mesh=None,
        paged_kernel: str = "fused",
        prefix_cache: bool = False,
        prefix_cache_entries: int = 8,
        spec_decode: bool = False,
        spec_draft_k: int = 8,
        spec_match_n: int = 2,
        pipeline=None,
        lora_bank: Optional[Dict[str, Any]] = None,
        grammars: Optional[Dict[str, Any]] = None,
        int8_act_prefill: bool = False,
    ):
        """``n_pages``: physical pool size (default: half the dense engine's
        reservation — the honest demonstration that more slots fit in less
        HBM). ``max_seq_len`` still bounds one request's length (the page
        table's static width); it no longer reserves anything.

        ``mesh``: optional Mesh("data","model"). "model" > 1 shards weights
        Megatron-style with the page pool REPLICATED over "model" (Gemma is
        MQA — one KV head, every shard computes identical K/V); the tick
        runs the per-layer TP paged kernels
        (kernels/decode_layer_paged_tp: paged window reads per shard,
        o/down psums in the glue). "data" > 1 additionally shards the SLOTS
        and the page pool over the data axis (round-3 DP paged serving):
        each data shard owns ``max_slots/data`` slots and
        ``n_pages/data`` physical pages with its own host-side allocator
        and garbage page, page-table entries are shard-LOCAL ids, admission
        pins each request to the shard whose budget covered it, and
        preemption is per-shard. Weights replicate over "data" (decode is
        weight-stream-bound, so DP buys aggregate KV capacity + slots, not
        weight bandwidth — see docs/PERFORMANCE.md). Pure DP (model == 1)
        runs the single-chip kernel paths per shard under shard_map;
        DP x TP requires the fused TP paged geometry (local page ids rule
        out the GSPMD XLA fallback).

        ``prefix_cache``: EXACT-match prefix KV reuse. PaliGemma's
        prefix-LM mask makes the image+prompt prefix fully bidirectional
        (ref: modeling_paligemma.py:149-169), so — unlike causal-LM prefix
        caching — KV is reusable only for byte-identical (input_ids,
        pixel_values) pairs; any prefix edit invalidates every position.
        When a prompt prefills, ownership of its full prefix pages
        transfers to a refcounted cache entry (zero copy) and the one
        partial tail page is copied once; a later identical request seats
        WITHOUT any prefill — it borrows the shared read-only pages, gets
        a private copy of the tail page (decode writes into it), and
        resumes from the stored last-logits row. LRU eviction at zero
        refcount under pool pressure; best-effort (registration is skipped
        when the pool is full). Under a DP mesh entries are shard-local
        (pages live in one shard's pool chunk): each entry carries a shard
        tag, ``_admit`` pins hits to the owning shard (spilling to a
        normal prefill when that shard is full), and tail-page copies run
        the DP read-modify-write (``_copy_page_dp``)."""
        assert max_seq_len % page_size == 0, (max_seq_len, page_size)
        self.dp = int(mesh.shape.get("data", 1)) if mesh is not None else 1
        if spec_decode:
            # paged speculation: every decode window becomes a scan of
            # verify cycles over the PAGE POOL (models/paligemma.
            # decode_verify_paged) — the multi-token forward writes K/V
            # across page boundaries, so the scheduler pre-reserves the
            # worst-case window advance + draft_k overshoot pages
            # (_before_window via _dispatch_spec).
            # pure TP composes exactly like the dense spec engine: the
            # verify forward is plain XLA, the decode weights carry
            # Megatron NamedShardings (super().__init__ device_put), the
            # pool replicates over "model" (_init_cache), and GSPMD
            # inserts the psums/all-gathers per cycle.
            # pure DP (round 4): the verify forward runs PER SHARD under
            # shard_map — pool chunk, page table (shard-local ids), and
            # slot rows shard over "data" exactly like the normal DP tick;
            # the propose/accept bookkeeping is per-row elementwise and
            # rides the "data"-sharded state arrays outside the shard_map.
            # Scheduler state (per-shard allocators, pinned admission,
            # shard-restricted preemption, assume-full-acceptance page
            # growth) is already shard-aware from the plain DP path.
            # DP x TP (round 4, second pass): the verify shard_map is
            # manual over "data" ONLY (jax.shard_map axis_names) — the
            # model axis stays under GSPMD inside the body, so the
            # Megatron weight shardings partition each data shard's
            # verify forward exactly like the pure-TP case while the
            # pool/page-table stay shard-local. Closes the last hole in
            # the TP/DP x dense/paged x spec matrix.
            # prefix_cache composes: hit seating seeds the n-gram
            # history/budget device state from the request's own ids
            # (_insert_cached), so a hit skips the prefill AND keeps
            # speculating (round-3 ROADMAP gap closed)
            paged_kernel = "xla"  # normal tick unused; skip kernel repacks
        # prefix_cache under DP (round 4): entries are shard-local (their
        # pages live in one shard's pool chunk), so each entry is tagged
        # with its owning shard, hits pin admission to that shard, and
        # tail-page copies run the DP read-modify-write (_copy_page_dp)
        self.prefix_cache = prefix_cache
        self.prefix_cache_entries = prefix_cache_entries
        self._pcache: "OrderedDict[bytes, Dict[str, Any]]" = OrderedDict()
        self._slot_borrow: Dict[int, bytes] = {}
        self._next_entry_owner = -2  # cache-entry owner ids: negative ints
        self.cache_hits = 0  # observability: prefills skipped via the cache
        if self.dp > 1:
            # DP prefill takes the GSPMD XLA attention path: the sharded
            # flash kernel shards the prefill batch over "data", but
            # admission-group batches (1..slots, padded to powers of two)
            # need not divide the data axis
            use_flash = False
        self.paged_kernel = paged_kernel
        if n_pages is None:
            n_pages = max(max_slots * max_seq_len // page_size // 2, 8)
            n_pages = -(-n_pages // self.dp) * self.dp
        if self.dp > 1:
            assert max_slots % self.dp == 0, (max_slots, self.dp)
            assert n_pages % self.dp == 0, (n_pages, self.dp)
        self.page_size = page_size
        self.n_pages = n_pages

        self._admission_order: List[int] = []  # slot ids, oldest first
        self._planned: Dict[int, int] = {}  # request_id -> pinned slot
        super().__init__(
            params, config, max_slots=max_slots, max_seq_len=max_seq_len,
            cache_dtype=cache_dtype, use_flash=use_flash,
            decode_params=decode_params, sync_every=sync_every, mesh=mesh,
            # the fused decode kernels read a contiguous (L, B, S, D) cache;
            # the paged pool has its own decode path (_tick_paged)
            fused_decode=False,
            spec_decode=spec_decode, spec_draft_k=spec_draft_k,
            spec_match_n=spec_match_n, pipeline=pipeline,
            lora_bank=lora_bank, grammars=grammars,
            int8_act_prefill=int8_act_prefill,
        )
        # DP x TP: the DP tick/verify shard_maps go manual over "data"
        # only, leaving "model" to GSPMD (jax.shard_map axis_names)
        self._dp_axis_names = (
            {"axis_names": {"data"}}
            if mesh is not None and self.dp > 1
            and int(mesh.shape.get("model", 1)) > 1
            else {}
        )
        self._ptp_packed = self._ptp_specs = None
        if self.lora_bank is not None:
            # Multi-LoRA paged serving: the rank-r deltas ride the XLA
            # projections of the page-walk tick (gemma.forward_paged_decode
            # threads the per-row bank gather exactly like the dense XLA
            # tick); the grid-over-layers fused/staged kernels never expose
            # per-layer activations, so a bank degrades the kernel. Under a
            # PURE-TP mesh (round 4) the GSPMD-partitioned "xla" page-walk
            # composes: Megatron weight shardings + replicated pool +
            # replicated bank (~2% of weight bytes at r=8), psums inserted
            # by GSPMD — same recipe as spec x TP. Under a PURE-DP mesh
            # (round 4) each data shard's tick already runs the single-chip
            # path under shard_map — the bank replicates into the shard_map
            # and the per-row adapter ids ride the "data"-sharded state, so
            # the page-walk variants compose per shard. DP x TP (round 4,
            # second pass): the DP tick's shard_map goes manual over
            # "data" only (axis_names), the model axis stays under GSPMD
            # inside each shard's XLA page-walk tick — Megatron weight
            # shardings + the replicated bank partition it like pure TP.
            if mesh is not None and self.dp == 1:
                paged_kernel = "xla"
                self.paged_kernel = "xla"
            elif (mesh is not None and self.dp > 1
                    and int(mesh.shape.get("model", 1)) > 1):
                # Pallas page-walk kernels can't run on GSPMD-managed
                # model-sharded activations; the XLA gather tick can
                paged_kernel = "xla"
                self.paged_kernel = "xla"
            elif paged_kernel == "staged":
                # the staging hybrid never threads adapters; "fused" now
                # KEEPS the fused tick on a single chip — the bank applies
                # in-kernel via the concat-basis pack (round 5; built
                # below once the layer repack confirms the geometry)
                paged_kernel = "multi"
                self.paged_kernel = "multi"
        if (mesh is not None and int(mesh.shape.get("model", 1)) > 1
                and not spec_decode and self.lora_bank is None):
            from ..kernels import decode_layer_paged_tp as _ptp
            from ..kernels import decode_layer_tp as _tp

            tc0 = config.text_config
            layers = self.decode_params["lm"]["layers"]
            if _ptp.supported(tc0, mesh, layers, batch=max_slots):
                # same packed tree the dense TP tick uses (head included:
                # the paged tick projects logits through the vocab-sharded
                # head OUTSIDE the shard_map instead)
                self._ptp_packed, self._ptp_specs = _tp.repack_for_tp(
                    self.decode_params["lm"], tc0, mesh
                )
                self.paged_kernel = "fused_tp"
            else:
                # off the fused-TP geometry: GSPMD-partitioned pure XLA.
                # Under DP x TP the tick's shard_map is manual over "data"
                # only (axis_names), so page ids stay shard-local while
                # GSPMD partitions the model axis inside each shard —
                # the plain GSPMD fallback would gather pool pages by
                # GLOBAL id, which the shard-local DP pool rules out.
                self.paged_kernel = "xla"
        elif self.paged_kernel in ("staged", "fused"):
            # "fused": grid-over-layers kernel with IN-KERNEL page-table
            # window reads (models/gemma.forward_paged_decode_fused) — one
            # pallas_call per tick instead of one per layer, so the
            # ~217 us/call launch floor is paid once (VERDICT r2 item 4;
            # .bench/call_floor_probe.py).
            # "staged" hybrid (forward_paged_decode_staged): gather the
            # window dense once per tick, run the fused dense layer
            # kernel, scatter the fresh K/V back into the pages.
            # Both need the int8 repacked layer tree the dense fused tick
            # uses (repack keeps the original mlp weights alongside, so
            # the prefill/fallback paths through the same tree still work).
            from ..kernels import decode_layer as _dl

            tc0 = config.text_config
            layers = self.decode_params["lm"]["layers"]
            staged_ok = (
                tc0.num_key_value_heads == 1
                and tc0.head_dim % 128 == 0
                and isinstance(layers["attn"].get("qkv"), dict)
                and "w8" in layers["attn"]["qkv"]
                # per-DATA-shard lockstep rows (the whole pool at dp=1)
                and max_slots // self.dp <= 32
            )
            if staged_ok:
                from ..kernels import decode_head as _dh

                dp = dict(self.decode_params)
                dp["lm"] = dict(dp["lm"])
                dp["lm"]["layers"] = jax.jit(_dl.repack_layers)(
                    dp["lm"]["layers"]
                )
                if "head_q" in dp["lm"]:
                    # blocked head repack for the greedy fast path's
                    # running-argmax kernel (kernels/decode_head)
                    dp["lm"]["head_q"] = jax.jit(_dh.repack_head)(
                        dp["lm"]["head_q"]
                    )
                self.decode_params = dp
                if self.lora_bank is not None:
                    # in-kernel multi-LoRA operands for the fused paged
                    # tick (same pack as the dense engine's fused tick)
                    tc0 = config.text_config
                    gate_blk = dp["lm"]["layers"]["mlp"]["gate_blk"]
                    _, nc0, _, bs0 = gate_blk.shape
                    self._lora_fused_pack = _dl.repack_lora_bank_fused(
                        self.lora_bank["layers"], nc=nc0, bs=bs0,
                        n_heads=tc0.num_attention_heads,
                        head_dim=tc0.head_dim, hidden=tc0.hidden_size,
                    )
            else:
                self.paged_kernel = "multi"  # graceful degrade
        # page-aligned prefill buckets: a short prompt occupies exactly its
        # pages, not a 64-token bucket's worth
        self._bucket_gran = max(page_size, 16)
        self.preemptions = 0  # observability: recompute evictions so far

        cfg = config
        ps = page_size

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("n_chunks",))
        def _insert_paged(pool, cache1, pages, row, n_chunks):
            """Copy ``n_chunks`` page-sized spans of prefill row ``row``
            into the physical pages listed in ``pages`` — all layers at
            once (pages are shared across layers)."""
            zero = jnp.zeros((), jnp.int32)
            n_layers = pool["k"].shape[0]
            for p in range(n_chunks):
                for n in ("k", "v"):
                    chunk = jax.lax.dynamic_slice(
                        cache1[n],
                        (zero, row, jnp.asarray(p * ps, jnp.int32), zero, zero),
                        (n_layers, 1, ps) + cache1[n].shape[3:],
                    ).astype(pool[n].dtype)
                    pool = {
                        **pool,
                        n: jax.lax.dynamic_update_slice(
                            pool[n], chunk, (zero, pages[p], zero, zero, zero)
                        ),
                    }
            return pool

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("n_chunks",))
        def _insert_paged_dp(pool, cache1, pages, row, owner, n_chunks):
            """DP variant: ``pages`` are shard-LOCAL ids valid only on data
            shard ``owner``. Runs a read-modify-write under shard_map: every
            shard touches the addressed local page, but only the owner's
            select keeps the fresh chunk — non-owners write their own page
            contents back unchanged."""
            from jax.sharding import PartitionSpec as P

            zero = jnp.zeros((), jnp.int32)
            n_layers = pool["k"].shape[0]
            tail = cache1["k"].shape[3:]

            def local(pk, pv, ck, cv, pages_l, row_l, owner_l):
                write = jax.lax.axis_index("data") == owner_l

                def upd(pool_arr, cache_arr):
                    out = pool_arr
                    for p in range(n_chunks):
                        chunk = jax.lax.dynamic_slice(
                            cache_arr,
                            (zero, row_l, jnp.asarray(p * ps, jnp.int32),
                             zero, zero),
                            (n_layers, 1, ps) + tail,
                        ).astype(pool_arr.dtype)
                        idx = (zero, pages_l[p], zero, zero, zero)
                        cur = jax.lax.dynamic_slice(
                            out, idx, (n_layers, 1, ps) + tail
                        )
                        out = jax.lax.dynamic_update_slice(
                            out, jnp.where(write, chunk, cur), idx
                        )
                    return out

                return upd(pk, ck), upd(pv, cv)

            pool_sp = P(None, "data", None, None, None)
            rep5 = P(None, None, None, None, None)
            pk, pv = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(pool_sp, pool_sp, rep5, rep5, P(None), P(), P()),
                out_specs=(pool_sp, pool_sp),
                check_vma=False,
            )(pool["k"], pool["v"], cache1["k"], cache1["v"], pages, row,
              owner)
            return {"k": pk, "v": pv}

        def _tick_paged(params, pool, state, page_table, active, key,
                        temps, top_ps, do_samples, with_sampling=False,
                        pages_bucket=None, kernel=None, lora=None,
                        gtable=None):
            k = kernel or self.paged_kernel
            if (not with_sampling and gtable is None and k == "fused"
                    and self.mesh is None):
                # greedy fast path (round 5): the fused paged kernel feeds
                # the int8 head's running-argmax kernel and the (B, 257k)
                # fp32 logits never materialize — the single largest glue
                # cost of the paged tick vs the dense engine's fused
                # greedy tick (.bench/paged_row_gap_probe.py: the paged
                # KERNEL is at per-row parity with dense; the gap was the
                # XLA head + logits carry). Selection reads the carried
                # next_tok (maintained by every logits-materializing
                # path), exactly like runtime/serving.py's fused tick.
                token = state["next_tok"]
                write_pos = state["write_pos"]
                next_tok, pool = paligemma.decode_step_greedy_paged(
                    params, cfg, token, pool, page_table,
                    write_pos=write_pos, position_ids=state["pos_ids"],
                    pages_bucket=pages_bucket,
                    lora=lora,
                    adapter_ids=(
                        state["adapter"] if lora is not None else None
                    ),
                )
                inc = active.astype(jnp.int32)
                state = {
                    **state,  # preserves "adapter" extras if present
                    "write_pos": write_pos + inc,
                    "pos_ids": state["pos_ids"] + inc,
                    "logits": state["logits"],  # stale; greedy never reads
                    "next_tok": jnp.where(
                        active, next_tok, state["next_tok"]
                    ),
                }
                return token, pool, state
            # greedy selection reads the CARRIED pending token (computed
            # from fresh logits when they were materialized, grammar-masked
            # at store/seat time) — exact even when earlier windows ran the
            # fused greedy fast path and left state["logits"] stale, the
            # same convention as the dense engine's tick
            # (runtime/serving.py). Sampled rows' logits are always fresh:
            # every tick they were active ran this materializing variant.
            greedy_tok = state["next_tok"]
            if with_sampling:
                logits = state["logits"]
                if gtable is not None:
                    # constrain the sampled choice to the row's LIVE DFA
                    # state (stored logits are unmasked by convention;
                    # gid 0 allows every token)
                    allowed = gtable[state["gid"], state["dstate"]] >= 0
                    logits = jnp.where(allowed, logits, -jnp.inf)
                sampled_tok = jax.vmap(
                    lambda k, lg, t, p: sampling.sample_top_p(k, lg[None], t, p)[0]
                )(jax.random.split(key, self.max_slots), logits, temps, top_ps)
                token = jnp.where(do_samples, sampled_tok, greedy_tok)
            else:
                token = greedy_tok

            extras = {}
            if gtable is not None:
                # advance each row's DFA by the consumed token; inactive
                # rows hold their state
                nxt_state = gtable[
                    state["gid"], state["dstate"], token
                ].astype(jnp.int32)
                extras["dstate"] = jnp.where(active, nxt_state, state["dstate"])

            write_pos = state["write_pos"]
            k = kernel or self.paged_kernel
            if k == "fused_tp":
                # per-layer TP paged kernels under shard_map (psums in the
                # glue); logits through the vocab-sharded head out here so
                # GSPMD inserts the all-gather
                from ..kernels import decode_layer_paged_tp as _ptp
                from ..models import gemma as gemma_mod

                hidden, pool = _ptp.decode_step_paged_tp(
                    self._ptp_packed, self._ptp_specs, cfg.text_config,
                    token, pool, page_table, write_pos,
                    position_ids=state["pos_ids"],
                    pages_bucket=pages_bucket or page_table.shape[1],
                    mesh=self.mesh,
                )
                new_logits = gemma_mod.lm_head(
                    params["lm"], hidden[:, None, :]
                )[:, 0].astype(jnp.float32)
            elif self.dp > 1:
                # DP (model == 1): every data shard runs the full
                # single-chip paged tick on its own slots and pool chunk
                # (weights replicated; page-table ids are shard-local).
                # DP x TP (model > 1): the shard_map goes manual over
                # "data" ONLY (axis_names) — inside each shard GSPMD still
                # sees the Megatron weight shardings and partitions the
                # XLA page-walk tick over "model" like the pure-TP case.
                from jax.sharding import PartitionSpec as P

                def dp_fn(p_, tok, pk, pv, pt_, wp, pos, lora_l, ad_l):
                    lg, pool2 = paligemma.decode_step_paged(
                        p_, cfg, tok, {"k": pk, "v": pv}, pt_,
                        write_pos=wp, position_ids=pos,
                        pages_bucket=pages_bucket, paged_kernel=k,
                        lora=lora_l, adapter_ids=ad_l,
                    )
                    return lg, pool2["k"], pool2["v"]

                pool_sp = P(None, "data", None, None, None)
                # multi-LoRA under pure DP: the bank replicates into every
                # shard's tick; per-row adapter ids shard with the slots
                ad = state["adapter"] if lora is not None else None
                lg, pk, pv = jax.shard_map(
                    dp_fn, mesh=self.mesh,
                    in_specs=(
                        jax.tree.map(lambda _: P(), params), P("data"),
                        pool_sp, pool_sp, P("data", None), P("data"),
                        P("data"), jax.tree.map(lambda _: P(), lora),
                        None if ad is None else P("data"),
                    ),
                    out_specs=(P("data", None), pool_sp, pool_sp),
                    check_vma=False, **self._dp_axis_names,
                )(params, token, pool["k"], pool["v"], page_table,
                  write_pos, state["pos_ids"], lora, ad)
                new_logits, pool = lg, {"k": pk, "v": pv}
            else:
                new_logits, pool = paligemma.decode_step_paged(
                    params, cfg, token, pool, page_table,
                    write_pos=write_pos, position_ids=state["pos_ids"],
                    pages_bucket=pages_bucket,
                    paged_kernel=k,
                    lora=lora,
                    adapter_ids=state["adapter"] if lora is not None else None,
                )
            inc = active.astype(jnp.int32)
            # keep the carried pending-greedy token consistent with what
            # the next tick's argmax-of-stored-logits would select (masked
            # by the DFA state just advanced), so windows can switch
            # between this variant and the fused greedy fast path freely
            sel2 = new_logits
            if gtable is not None:
                allowed2 = gtable[state["gid"], extras["dstate"]] >= 0
                sel2 = jnp.where(allowed2, new_logits, -jnp.inf)
            state = {
                **state,  # preserves "adapter"/"gid" extras if present
                "write_pos": write_pos + inc,
                "pos_ids": state["pos_ids"] + inc,
                "logits": jnp.where(active[:, None], new_logits, state["logits"]),
                "next_tok": jnp.where(
                    active,
                    jnp.argmax(sel2, -1).astype(jnp.int32),
                    state["next_tok"],
                ),
                **extras,
            }
            return token, pool, state

        @jax.jit
        def _set_slot_state(state, slot, prompt_len, row, last_logits,
                            ids1=None, max_new=None, adapter=None, gid=None,
                            gtable=None):
            # prompt rows are dense [0, prompt_len): write_pos == n_valid
            logits_row = jax.lax.dynamic_slice_in_dim(
                last_logits, row, 1, axis=0
            )[0]
            state = {
                **state,  # spec extras (if any) preserved
                "write_pos": state["write_pos"].at[slot].set(prompt_len),
                "pos_ids": state["pos_ids"].at[slot].set(prompt_len + 1),
                "logits": state["logits"].at[slot].set(logits_row),
            }
            if adapter is not None:
                state = {
                    **state,
                    "adapter": state["adapter"].at[slot].set(adapter),
                }
            if gid is not None:
                # DFA starts at state 0; the first tick masks the stored
                # (unmasked) logits with it before selecting
                state = {
                    **state,
                    "gid": state["gid"].at[slot].set(gid),
                    "dstate": state["dstate"].at[slot].set(0),
                }
            # pending greedy token: what the first tick's argmax-of-stored-
            # logits would select (grammar START mask applied) — keeps
            # next_tok consistent for the fused greedy fast path and spec
            sel = logits_row
            if gid is not None and gtable is not None:
                sel = jnp.where(gtable[gid, 0] >= 0, sel, -jnp.inf)
            next_tok = jnp.argmax(sel, -1).astype(jnp.int32)
            state = {
                **state,
                "next_tok": state["next_tok"].at[slot].set(next_tok),
            }
            if spec_decode:
                # seed the row's n-gram history (prompt + the not-yet-
                # emitted next token) and device budget — mirrors the
                # dense engine's _insert (runtime/serving.py)
                zero = jnp.zeros((), jnp.int32)
                ids_row = jax.lax.dynamic_slice_in_dim(
                    ids1, row, 1, axis=0
                )[0]
                hist_row = jnp.zeros((self.max_seq_len,), jnp.int32)
                hist_row = jax.lax.dynamic_update_slice(
                    hist_row, ids_row.astype(jnp.int32), (zero,)
                )
                hist_row = hist_row.at[prompt_len].set(next_tok)
                state = {
                    **state,
                    "hist": state["hist"].at[slot].set(hist_row),
                    "left": state["left"].at[slot].set(max_new),
                }
            return state

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _copy_page(pool, src, dst):
            """Duplicate one physical page (all layers, K and V) — the
            prefix cache's tail-page copy in both directions."""
            zero = jnp.zeros((), jnp.int32)
            n_layers = pool["k"].shape[0]
            sizes = (n_layers, 1) + pool["k"].shape[2:]
            for n in ("k", "v"):
                chunk = jax.lax.dynamic_slice(
                    pool[n], (zero, src, zero, zero, zero), sizes
                )
                pool = {
                    **pool,
                    n: jax.lax.dynamic_update_slice(
                        pool[n], chunk, (zero, dst, zero, zero, zero)
                    ),
                }
            return pool

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _copy_page_dp(pool, src, dst, owner):
            """DP variant of ``_copy_page``: ``src``/``dst`` are shard-LOCAL
            page ids valid only on data shard ``owner``. Same
            read-modify-write recipe as ``_insert_paged_dp`` — every shard
            touches its own local page ``dst``, only the owner keeps the
            copy."""
            from jax.sharding import PartitionSpec as P

            zero = jnp.zeros((), jnp.int32)
            n_layers = pool["k"].shape[0]
            sizes = (n_layers, 1) + pool["k"].shape[2:]

            def local(pk, pv, src_l, dst_l, owner_l):
                write = jax.lax.axis_index("data") == owner_l

                def upd(arr):
                    chunk = jax.lax.dynamic_slice(
                        arr, (zero, src_l, zero, zero, zero), sizes
                    )
                    idx = (zero, dst_l, zero, zero, zero)
                    cur = jax.lax.dynamic_slice(arr, idx, sizes)
                    return jax.lax.dynamic_update_slice(
                        arr, jnp.where(write, chunk, cur), idx
                    )

                return upd(pk), upd(pv)

            pool_sp = P(None, "data", None, None, None)
            pk, pv = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(pool_sp, pool_sp, P(), P(), P()),
                out_specs=(pool_sp, pool_sp),
                check_vma=False, **self._dp_axis_names,
            )(pool["k"], pool["v"], src, dst, owner)
            return {"k": pk, "v": pv}

        @functools.partial(jax.jit, donate_argnums=(1, 2),
                           static_argnames=("ticks", "with_sampling",
                                            "pages_bucket", "kernel"))
        def _decode_window_paged(params, pool, state, page_table, lefts, key,
                                 temps, top_ps, do_samples, lora=None,
                                 gtable=None, ticks=1,
                                 with_sampling=False, pages_bucket=None,
                                 kernel=None):
            """``ticks`` paged decode steps in ONE dispatch (lax.scan) —
            see ServingEngine._decode_window for the budget/lefts contract.
            The page table is window-invariant (``_before_window`` grows
            every row's pages up front), so it rides as a loop input."""
            key, *tick_keys = jax.random.split(key, ticks + 1)

            def body(carry, k):
                pool, state, lefts = carry
                token, pool, state = _tick_paged(
                    params, pool, state, page_table, lefts > 0, k, temps,
                    top_ps, do_samples, with_sampling=with_sampling,
                    pages_bucket=pages_bucket, kernel=kernel, lora=lora,
                    gtable=gtable,
                )
                return (pool, state, jnp.maximum(lefts - 1, 0)), token

            (pool, state, _), tokens = jax.lax.scan(
                body, (pool, state, lefts), jnp.stack(tick_keys)
            )
            return tokens, pool, state, key

        kd = spec_draft_k

        @functools.partial(
            jax.jit, donate_argnums=(1, 2),
            static_argnames=("ticks", "pages_bucket"),
        )
        def _spec_window_paged(params, pool, state, page_table, gtable=None,
                               ticks=1, pages_bucket=None):
            """``ticks`` speculative verify cycles over the page pool in
            ONE dispatch — the paged analog of ServingEngine._spec_window
            (same propose/accept bookkeeping, including the grammar-DFA
            constrained verify; the verify forward is
            paligemma.decode_verify_paged and no validity bitmap exists —
            rejected-draft K/V lives beyond each row's write_pos and a
            later cycle's per-query bound never reaches it before it is
            overwritten). The page table is window-invariant: _dispatch_spec
            pre-grows every row to the worst-case window advance."""
            from ..ops.ngram import propose_ngram

            j = jnp.arange(kd + 1, dtype=jnp.int32)[None]  # (1, kd+1)
            rows = jnp.arange(self.max_slots, dtype=jnp.int32)

            def body(carry, _):
                pool, state = carry
                left = state["left"]
                active = left > 0
                wp = state["write_pos"]
                draft = propose_ngram(
                    state["hist"], wp + 1, spec_match_n, kd
                )  # (B, kd)
                tokens_in = jnp.concatenate(
                    [state["next_tok"][:, None], draft], axis=1
                )  # (B, kd+1)
                if self.dp > 1:
                    # DP: each data shard verifies its own slot rows
                    # against its pool chunk (page ids are shard-LOCAL, so
                    # the forward must run under shard_map — same recipe
                    # as _tick_paged's dp_fn). With a model axis the
                    # shard_map is manual over "data" only (axis_names):
                    # GSPMD partitions each shard's verify forward over
                    # "model" via the Megatron weight shardings.
                    from jax.sharding import PartitionSpec as P

                    def dp_verify(p_, toks, pk, pv, pt_, wp_l, pos):
                        lg, pool2 = paligemma.decode_verify_paged(
                            p_, cfg, toks, {"k": pk, "v": pv}, pt_,
                            write_pos=wp_l, position_ids=pos,
                            pages_bucket=pages_bucket,
                        )
                        return lg, pool2["k"], pool2["v"]

                    pool_sp = P(None, "data", None, None, None)
                    lg, pk, pv = jax.shard_map(
                        dp_verify, mesh=self.mesh,
                        in_specs=(
                            jax.tree.map(lambda _: P(), params),
                            P("data", None), pool_sp, pool_sp,
                            P("data", None), P("data"), P("data"),
                        ),
                        out_specs=(P("data", None, None), pool_sp, pool_sp),
                        check_vma=False, **self._dp_axis_names,
                    )(params, tokens_in, pool["k"], pool["v"], page_table,
                      wp, state["pos_ids"])
                    logits, pool = lg, {"k": pk, "v": pv}
                else:
                    logits, pool = paligemma.decode_verify_paged(
                        params, cfg, tokens_in, pool, page_table,
                        write_pos=wp, position_ids=state["pos_ids"],
                        pages_bucket=pages_bucket,
                    )
                dstates = None
                if gtable is not None:
                    # constrained verify (see ServingEngine._spec_window):
                    # advance the DFA through the cycle's inputs and mask
                    # each position's argmax with its post-prefix state —
                    # disallowed drafts reject exactly, keeping token-
                    # identity with non-spec constrained decoding
                    s = state["dstate"]
                    states = []
                    for i in range(kd + 1):
                        s = gtable[
                            state["gid"], jnp.maximum(s, 0),
                            tokens_in[:, i],
                        ].astype(jnp.int32)
                        states.append(s)
                    dstates = jnp.stack(states, axis=1)  # (B, kd+1)
                    allowed = (
                        gtable[
                            state["gid"][:, None],
                            jnp.maximum(dstates, 0),
                        ] >= 0
                    )
                    logits = jnp.where(allowed, logits, -jnp.inf)
                g = jnp.argmax(logits, -1).astype(jnp.int32)  # (B, kd+1)
                n_acc = jnp.sum(
                    jnp.cumprod((draft == g[:, :kd]).astype(jnp.int32), 1), 1
                )
                n_keep = jnp.where(active, jnp.minimum(n_acc + 1, left), 0)
                nxt = jnp.take_along_axis(
                    g, jnp.maximum(n_keep - 1, 0)[:, None], axis=1
                )[:, 0]
                nxt = jnp.where(active, nxt, state["next_tok"])
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
                    "write_pos": wp + n_keep,
                    "pos_ids": state["pos_ids"] + n_keep,
                    "logits": state["logits"],  # stale; spec is greedy-only
                    "hist": hist,
                    "left": left - n_keep,
                }
                if gtable is not None:
                    s_kept = jnp.take_along_axis(
                        dstates, jnp.maximum(n_keep - 1, 0)[:, None], axis=1
                    )[:, 0]
                    new_state["gid"] = state["gid"]
                    new_state["dstate"] = jnp.where(
                        n_keep > 0, s_kept, state["dstate"]
                    )
                state = new_state
                out = jnp.where(j < n_keep[:, None], tokens_in, 0)
                return (pool, state), (out, n_keep)

            (pool, state), (tokens, counts) = jax.lax.scan(
                body, (pool, state), None, length=ticks
            )
            return tokens, counts, pool, state

        self._insert_paged = _insert_paged
        self._insert_paged_dp = _insert_paged_dp
        self._decode_window_paged = _decode_window_paged
        self._spec_window_paged = _spec_window_paged
        self._set_slot_state = _set_slot_state
        self._copy_page = _copy_page
        self._copy_page_dp = _copy_page_dp

    # -- backend hooks --------------------------------------------------
    def _check_mesh(self, mesh) -> None:
        """The paged engine accepts a data axis: slots and the page pool
        shard over it (see __init__ docstring)."""

    def _init_cache(self):
        """Page pool instead of the dense max_slots x max_seq_len block."""
        self.paged = PagedKVCache(
            self.config.text_config, n_pages=self.n_pages,
            page_size=self.page_size, max_slots=self.max_slots,
            max_pages_per_slot=self.max_seq_len // self.page_size,
            dtype=self.cache_dtype, n_shards=self.dp,
        )
        if self.mesh is not None:
            # pages shard over "data" (each data shard's slots address its
            # local chunk with local ids); MQA keeps the pool replicated
            # over "model" (each shard computes identical K/V from the
            # replicated kv proj)
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P(None, "data" if self.dp > 1 else None, None, None, None)
            sh = NamedSharding(self.mesh, spec)
            self.paged.pool = jax.tree.map(
                lambda x: jax.device_put(x, sh), self.paged.pool
            )
        return self.paged.pool

    def _zero_state(self) -> Dict[str, jnp.ndarray]:
        # no (max_slots, max_seq_len) validity bitmap: paged rows are
        # contiguous [0, write_pos+1) by construction
        state = {
            "write_pos": jnp.zeros((self.max_slots,), jnp.int32),
            "pos_ids": jnp.ones((self.max_slots,), jnp.int32),
            "logits": jnp.zeros(
                (self.max_slots, self.config.vocab_size), jnp.float32
            ),
            # pending greedy token (argmax of the last materialized logits,
            # grammar-masked at store time) — read by the fused greedy fast
            # path instead of re-argmaxing stored logits, and by spec
            "next_tok": jnp.zeros((self.max_slots,), jnp.int32),
        }
        if getattr(self, "spec_decode", False):
            # spec extras (mirrors the dense engine): n-gram history,
            # device-side remaining budgets
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
        if self.dp > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            state = {
                n: jax.device_put(
                    x, NamedSharding(
                        self.mesh, P("data", *([None] * (x.ndim - 1)))
                    )
                )
                for n, x in state.items()
            }
        return state

    def _admit(self, free_slots: list) -> List[Request]:
        """FIFO admission bounded by free slots AND free pages — per DATA
        shard: each request is pinned to the shard whose slot + page budget
        covers it (most-free-pages shard wins; ``_take_slot`` honors the
        pin). Stops at the first request that fits NO shard (no skip-ahead
        => no starvation)."""
        take: List[Request] = []
        shards = range(self.paged.n_shards)
        free_by_shard: Dict[int, List[int]] = {s: [] for s in shards}
        for sl in free_slots:
            free_by_shard[self.paged.shard_of(sl)].append(sl)
        budget = {s: self.paged.free_pages(s) for s in shards}
        for req in list(self.pending):
            if len(take) == len(free_slots):
                break
            # admit only with one decode page of headroom so the request
            # can always produce its first window without instant preemption
            need = self.paged.pages_for(self._bucket_of(req)) + 1
            cands = [
                s for s in shards if free_by_shard[s] and budget[s] >= need
            ]
            if not cands and self._pcache and self._evict_pcache():
                budget = {s: self.paged.free_pages(s) for s in shards}
                for r2 in take:  # re-subtract what this round already took
                    n2 = self.paged.pages_for(self._bucket_of(r2)) + 1
                    budget[self.paged.shard_of(self._planned[r2.request_id])] -= n2
                cands = [
                    s for s in shards if free_by_shard[s] and budget[s] >= need
                ]
            if not cands:
                break
            s = max(cands, key=lambda x: budget[x])
            if self.prefix_cache and self.paged.n_shards > 1:
                # pin cache hits to the shard owning the entry's pages
                # (page ids are shard-local); if that shard can't take the
                # request right now, fall through to the normal choice —
                # the hit degrades to a prefill instead of stalling
                k = self._pcache_key(req)
                e = self._pcache.get(k) if k is not None else None
                if e is not None and e.get("shard", 0) in cands:
                    s = e.get("shard", 0)
            budget[s] -= need
            self._planned[req.request_id] = free_by_shard[s].pop(0)
            take.append(req)
        del self.pending[: len(take)]
        return take

    def _take_slot(self, free: list, req: Request) -> int:
        slot = self._planned.pop(req.request_id, None)
        if slot is None:
            return free.pop(0)
        free.remove(slot)
        return slot

    # -- prefix cache (exact-match; see __init__ docstring) ---------------
    # key semantics (_pcache_key) are inherited from ServingEngine — the
    # engines share exact-match keys; only the entry storage differs
    # (zero-copy page borrowing here vs dense row copies there)

    def _wave_key(self, req: Request):
        """Coalesce same-wave duplicates: N byte-identical requests admitted
        together prefill ONCE — the leader registers the prefix-cache entry,
        the followers defer a pass and seat from it (serving.py
        ``_fill_slots``). Without this every duplicate in the first wave of
        a popular query prefilled redundantly."""
        return self._pcache_key(req)

    def _insert_cached(self, slot: int, req: Request) -> bool:
        key = self._pcache_key(req)
        entry = self._pcache.get(key) if key is not None else None
        if entry is None:
            return False
        if entry.get("shard", 0) != self.paged.shard_of(slot):
            # DP: the entry's pages live in another shard's pool chunk —
            # no cross-shard borrowing (page ids are shard-local). _admit
            # pins hits to the entry's shard, so this only triggers when
            # that shard was full and the request spilled elsewhere.
            return False
        prompt_len = len(req.input_ids)
        assert entry["prompt_len"] == prompt_len  # sha1(ids) fixes the len
        self.paged.set_borrowed(slot, entry["full_pages"])
        if entry["tail_page"] is not None:
            if not self.paged.grow_to(slot, prompt_len):
                self.paged.release(slot)  # clears the borrowed row
                return False  # pool full — fall back to a normal prefill
            dst = self.paged.slot_pages(slot)[0]
            if self.dp > 1:
                self.cache = self._copy_page_dp(
                    self.cache, jnp.asarray(entry["tail_page"], jnp.int32),
                    jnp.asarray(dst, jnp.int32),
                    jnp.asarray(entry.get("shard", 0), jnp.int32),
                )
            else:
                self.cache = self._copy_page(
                    self.cache, jnp.asarray(entry["tail_page"], jnp.int32),
                    jnp.asarray(dst, jnp.int32),
                )
        extra = {}
        if self.spec_decode:
            # a hit seats WITHOUT the prefill that normally seeds the
            # n-gram proposer — seed it here from the request's own ids
            # (compiles once per distinct prompt length, like prefill)
            extra = dict(
                ids1=jnp.asarray(
                    np.asarray(req.input_ids, np.int32)[None]
                ),
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
            # gtable is needed at EVERY grammar seat, not just spec: the
            # seeded next_tok must obey the grammar's START state (the
            # tick's greedy selection reads it — round-5 fast-path fix)
            extra["gtable"] = self.grammar_table
        self.state = self._set_slot_state(
            self.state, jnp.asarray(slot, jnp.int32),
            jnp.asarray(prompt_len, jnp.int32), jnp.asarray(0, jnp.int32),
            entry["logits"], **extra,
        )
        entry["refs"] += 1
        self._pcache.move_to_end(key)
        self._slot_borrow[slot] = key
        self._admission_order.append(slot)
        self.cache_hits += 1
        return True

    def _register_prefix(self, slot: int, req: Request, key: bytes,
                         row: int, last_logits) -> None:
        """Adopt a freshly-prefilled slot's prefix into the cache: transfer
        its full pages (no copy), copy its partial tail page (decode will
        write into the slot's copy), store the last-logits row."""
        ps = self.page_size
        prompt_len = len(req.input_ids)
        n_full = prompt_len // ps
        shard = self.paged.shard_of(slot)
        alloc = self.paged._allocs[shard]
        owner = self._next_entry_owner
        tail_page = None
        if prompt_len % ps:
            got = alloc.alloc(owner, 1)
            if got is None:
                return  # best-effort: no room for the tail copy
            tail_page = got[0]
            src = alloc.pages_of(slot)[n_full]
            if self.dp > 1:
                self.cache = self._copy_page_dp(
                    self.cache, jnp.asarray(src, jnp.int32),
                    jnp.asarray(tail_page, jnp.int32),
                    jnp.asarray(shard, jnp.int32),
                )
            else:
                self.cache = self._copy_page(
                    self.cache, jnp.asarray(src, jnp.int32),
                    jnp.asarray(tail_page, jnp.int32),
                )
        self._next_entry_owner -= 1
        full_pages = alloc.transfer(slot, owner, n_full)
        if n_full:
            self.paged._borrowed[slot] = n_full
        # stored as (1, vocab) — exactly the shape _set_slot_state takes, so
        # a hit dispatches no reshape (the first [None] reshape costs a
        # ~0.4 s compile that would otherwise land on the first hit)
        logits_row = jnp.copy(
            jax.lax.dynamic_slice_in_dim(last_logits, row, 1, axis=0)
        )
        self._pcache[key] = dict(
            owner=owner, full_pages=full_pages, tail_page=tail_page,
            prompt_len=prompt_len, logits=logits_row, refs=1, shard=shard,
        )
        self._slot_borrow[slot] = key
        # capacity: drop the least-recently-used unreferenced entries
        while len(self._pcache) > self.prefix_cache_entries:
            victim = next(
                (k for k, e in self._pcache.items() if e["refs"] <= 0), None
            )
            if victim is None:
                break
            self._free_entry(victim)

    def _free_entry(self, key: bytes) -> None:
        e = self._pcache.pop(key)
        self.paged._allocs[e.get("shard", 0)].free(e["owner"])

    def _evict_pcache(self) -> int:
        """Free every unreferenced cache entry (LRU first); returns pages
        recovered. Called under pool pressure before preempting live work."""
        freed = 0
        for k in list(self._pcache):
            e = self._pcache[k]
            if e["refs"] <= 0:
                freed += len(e["full_pages"]) + (e["tail_page"] is not None)
                self._free_entry(k)
        return freed

    def _insert_chunk(self, seated, cache1, mask, last_logits,
                      ids1=None) -> None:
        """Paged backend: each row's KV lands in its slot's page list (page
        tables differ per row, so the seat stays per-row; the page writes
        inside _insert_row are chunk-batched per slab)."""
        for r, (slot, req) in enumerate(seated):
            self._insert_row(slot, req, r, cache1, mask, last_logits,
                             ids1=ids1)

    def _insert_row(self, slot: int, req: Request, row: int, cache1, mask,
                    last_logits, ids1=None) -> None:
        bucket = mask.shape[1]
        ok = self.paged.grow_to(slot, bucket)
        assert ok, "admission reserved pages; grow_to must succeed"
        pages = self.paged.slot_pages(slot)
        n_chunks = bucket // self.page_size
        if self.dp > 1:
            self.cache = self._insert_paged_dp(
                self.cache, cache1,
                jnp.asarray(pages[:n_chunks], jnp.int32),
                jnp.asarray(row, jnp.int32),
                jnp.asarray(self.paged.shard_of(slot), jnp.int32), n_chunks,
            )
        else:
            self.cache = self._insert_paged(
                self.cache, cache1,
                jnp.asarray(pages[:n_chunks], jnp.int32),
                jnp.asarray(row, jnp.int32), n_chunks,
            )
        extra = {}
        if self.spec_decode:
            extra = dict(
                ids1=ids1,
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
            # gtable is needed at EVERY grammar seat, not just spec: the
            # seeded next_tok must obey the grammar's START state (the
            # tick's greedy selection reads it — round-5 fast-path fix)
            extra["gtable"] = self.grammar_table
        self.state = self._set_slot_state(
            self.state, jnp.asarray(slot, jnp.int32),
            jnp.asarray(len(req.input_ids), jnp.int32),
            jnp.asarray(row, jnp.int32), last_logits, **extra,
        )
        self._admission_order.append(slot)
        key = self._pcache_key(req)
        if key is not None and key not in self._pcache:
            self._register_prefix(slot, req, key, row, last_logits)

    def _release_slot(self, slot: int) -> None:
        key = self._slot_borrow.pop(slot, None)
        if key is not None and key in self._pcache:
            self._pcache[key]["refs"] -= 1
        self.paged.release(slot)
        if slot in self._admission_order:
            self._admission_order.remove(slot)

    def _before_window(self, ticks: int) -> None:
        """Grow every active slot's pages to cover this window; preempt the
        youngest request (recompute re-queue) whenever the pool is short.
        Growth covers DISPATCHED positions (in-flight pipelined windows
        write KV before their tokens are absorbed)."""
        for slot in list(self._admission_order):  # oldest first
            req = self.slots[slot]
            if req is None:
                continue
            need = len(req.input_ids) + self._dispatched[req.request_id] + ticks
            while not self.paged.grow_to(slot, min(need, self.max_seq_len)):
                # cheapest relief first: drop unreferenced prefix-cache
                # entries before preempting live work
                if self._pcache and self._evict_pcache():
                    continue
                # pages come from the slot's own DATA shard — only evicting
                # a neighbor on the SAME shard frees anything useful
                victim = self._preempt_youngest(
                    exclude=slot, shard=self.paged.shard_of(slot)
                )
                if victim is None:
                    raise RuntimeError(
                        f"page pool too small for a single request of "
                        f"{need} tokens (pool={self.n_pages} pages x "
                        f"{self.page_size}"
                        + (f" over {self.paged.n_shards} data shards"
                           if self.paged.n_shards > 1 else "")
                        + ")"
                    )

    def _preempt_youngest(
        self, exclude: int, shard: Optional[int] = None
    ) -> Optional[int]:
        """Evict the most recently admitted request (except ``exclude``;
        restricted to ``shard`` when given — DP pools are per-shard): free
        its pages and push it back on the queue front as a recompute
        request (prompt + generated so far; remaining budget)."""
        for slot in reversed(self._admission_order):
            if slot == exclude or self.slots[slot] is None:
                continue
            if shard is not None and self.paged.shard_of(slot) != shard:
                continue
            req = self.slots[slot]
            gen = self._generated.pop(req.request_id, 0)
            self._dispatched.pop(req.request_id, None)
            # in-flight pipelined windows dispatched before this eviction
            # carry tokens past ``gen`` — the epoch bump discards them
            req.epoch += 1
            if req.prefix_len is None:
                # the ORIGINAL prompt stays the bidirectional prefix; the
                # regenerated suffix was produced causally and must be
                # re-encoded causally (paligemma.prefill prefix_lens)
                req.prefix_len = len(req.input_ids)
            emitted = req.tokens[len(req.tokens) - gen:] if gen else []
            req.input_ids = np.concatenate(
                [np.asarray(req.input_ids, np.int32),
                 np.asarray(emitted, np.int32)]
            ) if emitted else np.asarray(req.input_ids, np.int32)
            req.max_new_tokens = max(req.max_new_tokens - gen, 1)
            self.slots[slot] = None
            self._release_slot(slot)
            self._sched_cache = None  # slot composition changed
            self.pending.insert(0, req)
            self.preemptions += 1
            return slot
        return None

    def _pages_bucket(self, ticks: int):
        """Smallest power-of-two logical-page window covering every active
        slot through this window (host-side bookkeeping) — one compiled
        decode tick per bucket, reads scale with live tokens."""
        p_max = self.max_seq_len // self.page_size
        need = max(
            (self.paged.pages_for(
                len(r.input_ids) + self._dispatched[r.request_id] + ticks)
             for r in self.slots if r is not None),
            default=1,
        )
        b = 1
        while b < need:
            b *= 2
        return min(b, p_max)

    # fused/staged kernel VMEM budget: the fused layer kernels double-buffer
    # the (B, W, D) K/V windows -> 2 rings x 2 tensors x B x W x D x 2 bytes;
    # weight rings take another ~30 MB of the ~128 MB VMEM. Past this the
    # tick must fall back to the page-walk kernel for that window.
    _STAGED_WINDOW_BYTES = 72 * 1024 * 1024

    def _kernel_for_bucket(self, pages_bucket: int) -> str:
        window = pages_bucket * self.page_size
        hd = self.config.text_config.head_dim
        b_local = self.max_slots // self.dp  # lockstep rows PER data shard
        if self.paged_kernel == "fused_tp":
            # per-layer kernel: single-buffered (B, W, D) K/V rings
            ring = 2 * b_local * window * hd * 2
            if ring <= self._STAGED_WINDOW_BYTES:
                return "fused_tp"
            if self.dp > 1:
                raise RuntimeError(
                    "DP x TP paged tick window exceeds the kernel VMEM "
                    f"budget ({ring} > {self._STAGED_WINDOW_BYTES} bytes at "
                    f"{b_local} slots/shard x {window} tokens) and local "
                    "page ids rule out the XLA fallback — reduce max_slots, "
                    "max_seq_len, or the data axis"
                )
            return "xla"
        if self.paged_kernel not in ("staged", "fused"):
            return self.paged_kernel
        ring = 2 * 2 * b_local * window * hd * 2
        return (
            self.paged_kernel if ring <= self._STAGED_WINDOW_BYTES else "multi"
        )

    def _run_window(self, ticks, lefts, temps_j, top_j, do_j,
                    with_sampling) -> jnp.ndarray:
        page_table = self.paged.page_table
        pages_bucket = self._pages_bucket(ticks)
        kernel = self._kernel_for_bucket(pages_bucket)
        tokens, self.cache, self.state, self._key = self._decode_window_paged(
            self.decode_params, self.cache, self.state, page_table,
            lefts, self._key, temps_j, top_j, do_j,
            lora=self._lora_arg(), gtable=self.grammar_table,
            ticks=ticks, with_sampling=with_sampling,
            pages_bucket=pages_bucket, kernel=kernel,
        )
        return tokens  # device array; caller syncs (see _absorb)

    def _run_spec_window(self, ticks: int):
        """Paged spec window: pages_bucket must cover the worst-case
        in-window advance — ``_dispatched`` already carries the assume-
        full-acceptance upper bound (base _dispatch_spec) — plus the last
        cycle's draft_k rejected-KV overshoot."""
        pages_bucket = self._pages_bucket(
            ticks * (self.spec_draft_k + 1) + self.spec_draft_k
        )
        tokens, counts, self.cache, self.state = self._spec_window_paged(
            self.decode_params, self.cache, self.state,
            self.paged.page_table, gtable=self.grammar_table,
            ticks=ticks, pages_bucket=pages_bucket,
        )
        return tokens, counts

    def warmup(self, prompt_lens, batch_sizes=(1, 2, 4, 8),
               sampling: bool = False) -> None:
        """Pre-compile prefill shapes, the paged insert (per bucket), and
        the paged decode tick."""
        g = self._bucket_gran
        buckets = sorted({
            min(((s + g - 1) // g) * g, self.max_seq_len) for s in prompt_lens
        })
        c = self.config.vision_config
        for bucket in buckets:
            for n in batch_sizes:
                if n > self.max_slots:
                    continue
                ids = np.zeros((n, bucket), np.int32)
                ids[:, 0] = self.config.image_token_index
                mask = np.ones((n, bucket), np.int32)
                from ..models import gemma as gemma_mod

                cache1 = gemma_mod.init_kv_cache(
                    self.config.text_config, n, self.max_seq_len,
                    self.cache_dtype,
                )
                pixels = np.zeros((n, 3, c.image_size, c.image_size), np.float32)
                last_logits, cache1 = self._prefill_batch(
                    self.params, jnp.asarray(pixels), jnp.asarray(ids),
                    jnp.asarray(mask), jnp.full((n,), bucket, np.int32),
                    cache1,
                )
                n_chunks = bucket // self.page_size
                scratch = jax.tree.map(jnp.copy, self.paged.pool)
                if self.dp > 1:
                    self._insert_paged_dp(
                        scratch, cache1,
                        jnp.zeros((n_chunks,), jnp.int32),
                        jnp.zeros((), jnp.int32),
                        jnp.zeros((), jnp.int32), n_chunks,
                    )
                else:
                    self._insert_paged(
                        scratch, cache1,
                        jnp.zeros((n_chunks,), jnp.int32),
                        jnp.zeros((), jnp.int32), n_chunks,
                    )
        # warm the decode tick at the pages bucket the first real window
        # will use (the bucket is a static jit arg — and the staged kernel
        # must never trace at the table's full width: at max_slots x
        # max_seq_len the window rings alone exceed VMEM)
        if self.spec_decode:
            # every window is a spec window (greedy-only engine)
            w = self.sync_every * (self.spec_draft_k + 1)
            need = self.paged.pages_for(
                max(buckets) + w * (2 if self.pipeline else 1)
                + self.spec_draft_k
            )
            pb = 1
            while pb < need:
                pb *= 2
            pb = min(pb, self.max_seq_len // self.page_size)
            for ticks in sorted({1, self.sync_every}):
                scratch = jax.tree.map(jnp.copy, self.paged.pool)
                self._spec_window_paged(
                    self.decode_params, scratch, self._zero_state(),
                    self.paged.page_table, gtable=self.grammar_table,
                    ticks=ticks, pages_bucket=pb,
                )
            return
        need = self.paged.pages_for(max(buckets) + self.sync_every)
        pb = 1
        while pb < need:
            pb *= 2
        pb = min(pb, self.max_seq_len // self.page_size)
        variants = (False, True) if sampling else (False,)
        for with_sampling in variants:
            for ticks in sorted({1, self.sync_every}):
                scratch = jax.tree.map(jnp.copy, self.paged.pool)
                zeros_f = jnp.zeros((self.max_slots,), jnp.float32)
                self._decode_window_paged(
                    self.decode_params, scratch, self._zero_state(),
                    self.paged.page_table,
                    jnp.zeros((self.max_slots,), jnp.int32),
                    jax.random.PRNGKey(0), zeros_f + 1.0, zeros_f + 1.0,
                    jnp.zeros((self.max_slots,), bool),
                    lora=self._lora_arg(), gtable=self.grammar_table,
                    ticks=ticks, with_sampling=with_sampling,
                    pages_bucket=pb, kernel=self._kernel_for_bucket(pb),
                )
        if self.prefix_cache:
            # pre-compile the hit-seating path (tail-page copy + slot-state
            # set): otherwise the FIRST cache hit pays ~1 s of compiles
            scratch = jax.tree.map(jnp.copy, self.paged.pool)
            self._copy_page(
                scratch, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)
            )
            self._set_slot_state(
                self._zero_state(), jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                jnp.zeros((1, self.config.vocab_size), jnp.float32),
            )
