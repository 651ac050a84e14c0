"""Paged KV allocator for serving many concurrent long-context sequences.

Memory model: one shared page pool per target layer (plus one for the draft
ring when used), `[n_pages, Hkv, page, D]` each, and a free list on the
host. A sequence's KV footprint is `ceil(len / page)` pages instead of a
full `s_max` slot — the classic paged-attention serving layout, built
TPU-native: the pool is a single static-shape device buffer (XLA never
reallocates), page indirection happens in the scalar-prefetch channel of
`ops.pallas_paged.paged_flash_decode`, and page writes are functional
scatters (`write_paged_rows`) that XLA lowers in place under donation.

The reference has no serving layer (SURVEY §2.1: its CLIs decode one fixed
batch end to end), so this subsystem has no counterpart to port — it is the
production-serving piece BASELINE.md's north star implies.

Host-side allocation only manages INTEGERS (free page ids); all device
state is the pool. Allocation/free are O(pages) list ops per request —
nothing touches the device.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class PagePool:
    """Free-list allocator over a fixed number of KV pages.

    Tracks logical sequences: `alloc(uid, n_tokens)` reserves enough pages,
    `extend(uid, n_tokens)` grows a sequence (returns newly added physical
    page ids), `free(uid)` releases. `table(uid, n_chunks)` renders the
    padded page-table row the paged kernel consumes.
    """

    def __init__(self, n_pages: int, page: int):
        if n_pages <= 0 or page <= 0:
            raise ValueError((n_pages, page))
        self.n_pages = n_pages
        self.page = page
        self._free: List[int] = list(range(n_pages - 1, -1, -1))
        self._seqs: Dict[int, List[int]] = {}
        self._lens: Dict[int, int] = {}
        # prefix cache state (see "prefix cache" section below)
        self._refs: Dict[int, int] = {}       # live page -> refcount
        self._cached: "OrderedDict[int, None]" = OrderedDict()  # LRU, 0-ref
        self._page_hash: Dict[int, int] = {}  # page -> chain id
        self._hash2page: Dict[int, int] = {}  # chain id -> page
        self._chains: Dict[tuple, int] = {}   # (parent, chunk) -> chain id
        self._next_chain = 1
        # lifetime counters (serving observability; `stats()`)
        self._allocs = 0          # alloc() calls
        self._extends = 0         # extend() calls that took >=1 page
        self._frees = 0           # free() calls
        self._pages_cycled = 0    # fresh pages handed out over the lifetime
        self._pages_reused = 0    # prefix-cache hits (refcounted shares)
        self._evictions = 0       # cached pages reclaimed under pressure
        self._peak_used = 0       # high-water mark of in-use pages

    # -- accounting -----------------------------------------------------

    @property
    def free_pages(self) -> int:
        return len(self._free)

    @property
    def used_pages(self) -> int:
        """Pages referenced by live sequences (cached 0-ref pages excluded)."""
        return len(self._refs)

    def stats(self) -> dict:
        """Pool observability: utilization, reuse, and churn.

        `reuse_factor` = pages handed out over the pool lifetime / pool size
        — how many times the average physical page has been recycled; the
        pool has no external fragmentation by construction (pages are fully
        fungible), so `waste_tokens` (allocated-but-unused token slots from
        ceil-division, i.e. internal fragmentation) is the only padding
        metric that matters."""
        waste = sum(len(p) * self.page - l
                    for p, l in ((self._seqs[u], self._lens[u])
                                 for u in self._seqs))
        return {
            "n_pages": self.n_pages,
            "used_pages": self.used_pages,
            "free_pages": self.free_pages,
            "utilization": round(self.used_pages / self.n_pages, 4),
            "peak_used_pages": self._peak_used,
            "live_seqs": len(self._seqs),
            "allocs": self._allocs,
            "extends": self._extends,
            "frees": self._frees,
            "pages_cycled": self._pages_cycled,
            "reuse_factor": round(self._pages_cycled / self.n_pages, 4),
            "waste_tokens": waste,
            "cached_pages": len(self._cached),
            "pages_reused": self._pages_reused,
            "evictions": self._evictions,
        }

    def pages_of(self, uid: int) -> List[int]:
        return list(self._seqs[uid])

    def len_of(self, uid: int) -> int:
        return self._lens[uid]

    def _need(self, n_tokens: int) -> int:
        return max(1, -(-n_tokens // self.page))

    @property
    def cached_pages(self) -> int:
        """Zero-ref pages retained for prefix reuse (reclaimable)."""
        return len(self._cached)

    def can_alloc(self, n_tokens: int) -> bool:
        return self._need(n_tokens) <= len(self._free) + len(self._cached)

    def can_alloc_shared(self, shared_pages: List[int],
                         n_tokens: int) -> bool:
        """Like can_alloc, but the first `shared_pages` come from the prefix
        cache: only the remainder needs fresh pages, and shared pages that
        currently sit in the LRU cache cannot double as eviction fodder."""
        n_fresh = self._need(n_tokens) - len(shared_pages)
        in_cache = sum(1 for p in shared_pages if p in self._cached)
        return n_fresh <= len(self._free) + len(self._cached) - in_cache

    def _take(self, n: int) -> List[int]:
        """Take n fresh pages: free list first, then LRU-evict cached
        prefix pages (their hash entries are dropped)."""
        if n > len(self._free) + len(self._cached):
            raise MemoryError(f"pool exhausted: need {n} pages, free "
                              f"{len(self._free)} + cached "
                              f"{len(self._cached)}")
        out = []
        for _ in range(n):
            if self._free:
                p = self._free.pop()
            else:
                p, _ = self._cached.popitem(last=False)   # LRU evict
                self._evictions += 1
                key = self._page_hash.pop(p)
                self._hash2page.pop(key, None)
            self._refs[p] = 1
            out.append(p)
        self._pages_cycled += n
        return out

    # -- lifecycle ------------------------------------------------------

    def alloc(self, uid: int, n_tokens: int) -> List[int]:
        return self.alloc_shared(uid, [], n_tokens)

    def alloc_shared(self, uid: int, shared_pages: List[int],
                     n_tokens: int) -> List[int]:
        """Reserve capacity for n_tokens, the first pages SHARED with other
        sequences (prefix cache hit: refcount++ instead of a fresh page).
        Shared pages must be live or cached (a match_prefix result)."""
        if uid in self._seqs:
            raise KeyError(f"uid {uid} already allocated")
        need = self._need(n_tokens)
        assert len(shared_pages) <= need, (shared_pages, need)
        for p in shared_pages:
            if p in self._cached:           # revive from the LRU cache
                del self._cached[p]
                self._refs[p] = 1
            else:
                self._refs[p] += 1
        self._pages_reused += len(shared_pages)
        pages = list(shared_pages) + self._take(need - len(shared_pages))
        self._seqs[uid] = pages
        self._lens[uid] = n_tokens
        self._allocs += 1
        self._peak_used = max(self._peak_used, self.used_pages)
        return list(pages)

    def extend(self, uid: int, n_tokens: int) -> List[int]:
        """Grow uid by n_tokens; returns the NEWLY allocated page ids."""
        cur = self._lens[uid]
        new_len = cur + n_tokens
        have = len(self._seqs[uid])
        need = self._need(new_len) - have
        fresh = self._take(need) if need > 0 else []
        self._seqs[uid].extend(fresh)
        self._lens[uid] = new_len
        if fresh:
            self._extends += 1
            self._peak_used = max(self._peak_used, self.used_pages)
        return fresh

    def free(self, uid: int) -> None:
        for p in reversed(self._seqs.pop(uid)):
            self._refs[p] -= 1
            if self._refs[p] > 0:
                continue                      # still shared by another seq
            del self._refs[p]
            if p in self._page_hash:          # registered prompt page:
                self._cached[p] = None        # retain for future prefix hits
            else:
                self._free.append(p)
        self._lens.pop(uid)
        self._frees += 1

    # -- prefix cache ----------------------------------------------------
    #
    # Page-level prompt-prefix sharing (the paged-attention "automatic
    # prefix caching" design): a FULL page of prompt tokens is identified by
    # the chain (all tokens before it, its own tokens) — interned to an int
    # id, so lookups are exact (no hash collisions can alias different
    # prefixes). KV of such a page depends only on that token chain and the
    # absolute positions (causal attention, positions always 0-based at
    # prefill), so two requests whose prompts agree through page i can share
    # the physical page. Decode never writes below cache_lens, hence never
    # into a full prompt page. Zero-ref registered pages are RETAINED in an
    # LRU and evicted only under allocation pressure.

    def _chain_id(self, parent: int, chunk: tuple, create: bool):
        key = (parent, chunk)
        cid = self._chains.get(key)
        if cid is None and create:
            cid = self._next_chain
            self._next_chain += 1
            self._chains[key] = cid
        return cid

    def match_prefix(self, tokens) -> Tuple[int, List[int]]:
        """Longest cached page-aligned prefix of `tokens` usable by a new
        request. Returns (n_matched_pages, page_ids). At least one token is
        always left for suffix compute (the last prompt token's hidden state
        produces the first sampled token), so matching is capped at
        (len-1) // page pages."""
        toks = [int(t) for t in tokens]
        limit = (len(toks) - 1) // self.page
        pages, parent = [], 0
        for i in range(limit):
            chunk = tuple(toks[i * self.page:(i + 1) * self.page])
            parent = self._chain_id(parent, chunk, create=False)
            if parent is None:
                break
            p = self._hash2page.get(parent)
            if p is None:
                break
            pages.append(p)
        return len(pages), pages

    def register(self, uid: int, tokens) -> int:
        """Publish uid's full prompt pages for future prefix sharing.
        Returns the number of pages registered. Call AFTER the page KV is
        written (admission)."""
        toks = [int(t) for t in tokens]
        pages = self._seqs[uid]
        n_full = len(toks) // self.page
        parent, n_reg = 0, 0
        for i in range(min(n_full, len(pages))):
            chunk = tuple(toks[i * self.page:(i + 1) * self.page])
            parent = self._chain_id(parent, chunk, create=True)
            cur = self._hash2page.get(parent)
            if cur is not None:
                continue                      # already published (shared)
            p = pages[i]
            if p in self._page_hash:          # page re-registered under a
                self._hash2page.pop(self._page_hash[p], None)  # new chain
            self._hash2page[parent] = p
            self._page_hash[p] = parent
            n_reg += 1
        return n_reg

    # -- kernel-facing views -------------------------------------------

    def table(self, uid: int, n_chunks: int,
              pad: Optional[int] = None) -> np.ndarray:
        """[n_chunks] int32 page-table row. Padding defaults to the last
        page id — safe for READS (the kernel clamps to pages-used). Callers
        that may WRITE through padded entries (e.g. a fixed-width prefill
        scatter) must pass `pad` = a reserved scratch page so out-of-range
        rows land there instead of corrupting the sequence's last page."""
        pages = self._seqs[uid]
        if len(pages) > n_chunks:
            raise ValueError(f"uid {uid} holds {len(pages)} pages > "
                             f"table width {n_chunks}")
        if pad is None:
            pad = pages[-1] if pages else 0
        row = pages + [pad] * (n_chunks - len(pages))
        return np.asarray(row, np.int32)

    def batch_table(self, uids, n_chunks: int,
                    pad: Optional[int] = None) -> np.ndarray:
        return np.stack([self.table(u, n_chunks, pad) for u in uids])


def alloc_paged_kv(n_pages: int, hkv: int, page: int, head_dim: int,
                   n_layers: int = 1, dtype=jnp.bfloat16):
    """Device pools: ([L, n_pages, Hkv, page, D] k, same v). One page table
    serves every layer (all layers share the logical layout)."""
    shape = (n_layers, n_pages, hkv, page, head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
