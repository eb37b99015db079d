"""Paged KV cache: a shared physical page pool + host-side page allocator.

The slot-pool engine reserves ``max_slots x max_seq_len`` KV rows up front,
so HBM reservation caps concurrency even when every live request is short.
This module keeps KV in fixed-size pages drawn from ONE pool shared by all
slots; a request holds exactly ``ceil(len/page_size)`` pages and grows one
page at a time as it decodes. Slot count is then bounded by *aggregate live
tokens*, not ``max_slots x max_seq_len`` (VERDICT r1 item 9; the vLLM
PagedAttention model, TPU-shaped — PAPERS.md "Ragged Paged Attention").

Split of responsibilities:

* ``PageAllocator`` — pure host bookkeeping (free list, per-owner page
  lists). O(1) alloc/free, no device work.
* ``PagedKVCache`` — owns the device pool ``(L, n_pages, page_size, nkv, d)``
  and the device page-table mirror. The page table is tiny
  (``max_slots x max_pages`` int32) and is re-uploaded only when the
  allocation changes — same host->device discipline as the serving
  engine's scheduling arrays.

The reference has no analog: it serves B==1 with a Python-list torch.cat
cache (ref: modeling_gemma.py:8-64, processing_paligemma.py:174).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import GemmaConfig


class PageAllocator:
    """Contiguity-preferring free-list page allocator, pages in
    [first, n_pages).

    ``first=1`` reserves physical page 0 as a never-allocated GARBAGE page:
    inactive slot rows keep page-table entries of 0, so their (discarded)
    lockstep writes and clamped attention reads land there instead of in
    pages that may have been reallocated to live requests.

    Allocation policy (host-side, O(n_pages) scans are ~us next to a
    device tick): first try to EXTEND the owner's tail run (decode growth
    stays physically consecutive with the prompt), then FIRST-FIT a
    consecutive run of ``n``, then fall back to arbitrary free pages.
    Physically-consecutive runs are what let the run-coalesced paged
    attention kernel (kernels/paged_attention.paged_decode_attention_runs)
    fetch a whole super-block with ONE DMA issue instead of one per page —
    DMA issue cost is the measured page-walk bound on this toolchain
    (docs/PERFORMANCE.md "Kernel note")."""

    def __init__(self, n_pages: int, first: int = 0):
        self.n_pages = n_pages
        self._free = set(range(first, n_pages))
        self._owned: Dict[int, List[int]] = {}  # owner id -> page list

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def pages_of(self, owner: int) -> List[int]:
        return self._owned.get(owner, [])

    def _take(self, owner: int, pages: List[int]) -> List[int]:
        self._free.difference_update(pages)
        self._owned.setdefault(owner, []).extend(pages)
        return pages

    def alloc(self, owner: int, n: int) -> Optional[List[int]]:
        """Append ``n`` pages to ``owner``; None (and no change) if the pool
        can't cover it — the caller decides to defer admission or preempt."""
        if n > len(self._free):
            return None
        if n == 0:
            return []
        owned = self._owned.get(owner)
        # grow: continue the owner's tail run if the next pages are free
        if owned:
            tail = owned[-1]
            run = list(range(tail + 1, tail + 1 + n))
            if run and run[-1] < self.n_pages and self._free.issuperset(run):
                return self._take(owner, run)
        # fresh (or fragmented-grow): first-fit a consecutive run of n
        free_sorted = sorted(self._free)
        run_start, run_len = free_sorted[0], 1
        for prev, cur in zip(free_sorted, free_sorted[1:]):
            run_len = run_len + 1 if cur == prev + 1 else 1
            if run_len == 1:
                run_start = cur
            if run_len >= n:
                return self._take(
                    owner, list(range(run_start, run_start + n))
                )
        if n == 1 and free_sorted:  # loop above never sees a 1-run of [0]
            return self._take(owner, free_sorted[:1])
        # fragmented pool: hand out whatever is free (the runs kernel
        # falls back to per-page DMA for non-contiguous super-blocks)
        return self._take(owner, free_sorted[:n])

    def free(self, owner: int) -> None:
        self._free.update(self._owned.pop(owner, []))

    def transfer(self, frm: int, to: int, n: int) -> List[int]:
        """Move ownership of ``frm``'s FIRST ``n`` pages to ``to`` (no device
        work — the physical ids are unchanged). Used by the prefix cache to
        adopt a slot's full-prefix pages without copying them."""
        owned = self._owned.get(frm, [])
        assert len(owned) >= n, (frm, owned, n)
        moved, self._owned[frm] = owned[:n], owned[n:]
        if not self._owned[frm]:
            del self._owned[frm]
        self._owned.setdefault(to, []).extend(moved)
        return moved


class PagedKVCache:
    """Device page pool + page-table mirror for a fixed slot count.

    ``max_pages_per_slot`` bounds the page table's static width (the
    attention grid walks logical pages up to each row's length, so unused
    width costs nothing but table bytes).

    ``n_shards`` > 1 partitions BOTH the slots and the pool into equal
    data-parallel shards: slot ``s`` belongs to shard ``s // slots_per_
    shard``, its pages come from that shard's private allocator, and every
    page-table entry is a SHARD-LOCAL physical id in
    ``[0, n_pages / n_shards)``. The device pool keeps its global
    ``(L, n_pages, ...)`` shape — the engine shards axis 1 over the mesh's
    "data" axis, so each device shard indexes its local chunk with exactly
    the local ids this table holds. Each shard reserves its own local page
    0 as the garbage page."""

    def __init__(
        self,
        cfg: GemmaConfig,
        n_pages: int,
        page_size: int,
        max_slots: int,
        max_pages_per_slot: int,
        dtype=jnp.bfloat16,
        n_shards: int = 1,
    ):
        assert page_size % 16 == 0, page_size  # bf16 sublane tile
        assert n_pages % n_shards == 0, (n_pages, n_shards)
        assert max_slots % n_shards == 0, (max_slots, n_shards)
        self.cfg = cfg
        self.page_size = page_size
        self.n_pages = n_pages
        self.max_slots = max_slots
        self.max_pages_per_slot = max_pages_per_slot
        self.n_shards = n_shards
        self.slots_per_shard = max_slots // n_shards
        self.pages_per_shard = n_pages // n_shards
        shape = (
            cfg.num_hidden_layers, n_pages, page_size,
            cfg.num_key_value_heads, cfg.head_dim,
        )
        self.pool = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        # local page 0 of every shard is its reserved garbage page
        self._allocs = [
            PageAllocator(self.pages_per_shard, first=1)
            for _ in range(n_shards)
        ]
        # host-side page table of LOCAL ids; slot rows point at the garbage
        # page 0 until assigned — inactive rows' writes/reads land there
        # harmlessly
        self._table_np = np.zeros((max_slots, max_pages_per_slot), np.int32)
        self._table_dev: Optional[jnp.ndarray] = None  # uploaded lazily
        # prefix-cache support: leading table entries a slot BORROWS from a
        # shared read-only prefix (owned by a cache entry, not the slot);
        # grow_to appends the slot's own pages after them
        self._borrowed: Dict[int, int] = {}

    @property
    def alloc(self) -> PageAllocator:
        """The single allocator (unsharded pools only — the common case)."""
        assert self.n_shards == 1
        return self._allocs[0]

    def shard_of(self, slot: int) -> int:
        return slot // self.slots_per_shard

    def free_pages(self, shard: int = 0) -> int:
        return self._allocs[shard].free_pages

    # -- allocation ----------------------------------------------------
    def pages_for(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    def grow_to(self, slot: int, n_tokens: int) -> bool:
        """Ensure ``slot`` owns pages covering ``n_tokens``; allocates the
        shortfall from the slot's shard. False (no change) if that shard's
        pool is exhausted."""
        need = self.pages_for(n_tokens)
        if need > self.max_pages_per_slot:
            return False
        alloc = self._allocs[self.shard_of(slot)]
        borrowed = self._borrowed.get(slot, 0)
        have = borrowed + len(alloc.pages_of(slot))
        if need <= have:
            return True
        got = alloc.alloc(slot, need - have)
        if got is None:
            return False
        pages = alloc.pages_of(slot)
        self._table_np[slot, have:need] = got
        self._table_dev = None  # invalidate device mirror
        assert (
            self._table_np[slot, borrowed: borrowed + len(pages)].tolist()
            == pages
        )
        return True

    def set_borrowed(self, slot: int, pages: List[int]) -> None:
        """Point the leading table entries of ``slot`` at shared read-only
        pages it does NOT own (a prefix-cache hit). Must run before any
        grow_to for the slot."""
        assert not self._allocs[self.shard_of(slot)].pages_of(slot), slot
        self._table_np[slot, : len(pages)] = pages
        self._borrowed[slot] = len(pages)
        self._table_dev = None

    def release(self, slot: int) -> None:
        """Free the slot's pages and point its table row back at the garbage
        page — a retired slot must never address pages that may be
        reallocated to a live request. Borrowed prefix pages are NOT freed
        (their cache entry owns them); the engine drops the refcount."""
        self._allocs[self.shard_of(slot)].free(slot)
        self._borrowed.pop(slot, None)
        self._table_np[slot, :] = 0
        self._table_dev = None

    @property
    def page_table(self) -> jnp.ndarray:
        """Device page table, re-uploaded only after allocation changes."""
        if self._table_dev is None:
            self._table_dev = jnp.asarray(self._table_np)
        return self._table_dev

    def slot_pages(self, slot: int) -> List[int]:
        """Shard-LOCAL physical page ids owned by ``slot``."""
        return self._allocs[self.shard_of(slot)].pages_of(slot)
