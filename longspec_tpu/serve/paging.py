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

from typing import Dict, List

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
        # lifetime counters (serving observability; `stats()`)
        self._allocs = 0          # alloc() calls
        self._extends = 0         # extend() calls that took >=1 page
        self._frees = 0           # free() calls
        self._pages_cycled = 0    # pages handed out over the pool lifetime
        self._peak_used = 0       # high-water mark of in-use pages

    # -- accounting -----------------------------------------------------

    @property
    def free_pages(self) -> int:
        return len(self._free)

    @property
    def used_pages(self) -> int:
        return self.n_pages - len(self._free)

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
        }

    def pages_of(self, uid: int) -> List[int]:
        return list(self._seqs[uid])

    def len_of(self, uid: int) -> int:
        return self._lens[uid]

    def _need(self, n_tokens: int) -> int:
        return max(1, -(-n_tokens // self.page))

    def can_alloc(self, n_tokens: int) -> bool:
        return self._need(n_tokens) <= len(self._free)

    # -- lifecycle ------------------------------------------------------

    def alloc(self, uid: int, n_tokens: int) -> List[int]:
        if uid in self._seqs:
            raise KeyError(f"uid {uid} already allocated")
        need = self._need(n_tokens)
        if need > len(self._free):
            raise MemoryError(
                f"pool exhausted: need {need} pages, free {len(self._free)}")
        pages = [self._free.pop() for _ in range(need)]
        self._seqs[uid] = pages
        self._lens[uid] = n_tokens
        self._allocs += 1
        self._pages_cycled += need
        self._peak_used = max(self._peak_used, self.used_pages)
        return list(pages)

    def extend(self, uid: int, n_tokens: int) -> List[int]:
        """Grow uid by n_tokens; returns the NEWLY allocated page ids."""
        cur = self._lens[uid]
        new_len = cur + n_tokens
        have = len(self._seqs[uid])
        need = self._need(new_len) - have
        if need > len(self._free):
            raise MemoryError(
                f"pool exhausted: need {need} pages, free {len(self._free)}")
        fresh = [self._free.pop() for _ in range(need)]
        self._seqs[uid].extend(fresh)
        self._lens[uid] = new_len
        if fresh:
            self._extends += 1
            self._pages_cycled += len(fresh)
            self._peak_used = max(self._peak_used, self.used_pages)
        return fresh

    def free(self, uid: int) -> None:
        self._free.extend(reversed(self._seqs.pop(uid)))
        self._lens.pop(uid)
        self._frees += 1

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
