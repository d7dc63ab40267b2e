"""Page allocator for the paged KV cache.

Same O(1) LIFO free-list design as the reference's token-slot allocator
(`nanovllmx/core/kv_cache.py:101-117`), but at **page** granularity: on TPU,
per-token slot gather defeats vector-memory tiling, so the unit of allocation
is a page of `page_size` tokens (the attention kernels index pages, not slots).
"""

from __future__ import annotations


class PageAllocator:
    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        # LIFO stack: recently freed pages are reused first (warm in HBM TLB
        # terms this is irrelevant, but it keeps index locality high, which
        # helps the page-gather DMA pattern).
        self._free: list[int] = list(range(num_pages - 1, -1, -1))

    @property
    def num_free(self) -> int:
        return len(self._free)

    @property
    def num_used(self) -> int:
        return self.num_pages - len(self._free)

    def alloc(self, n: int) -> list[int] | None:
        """Allocate n pages; returns None (allocating nothing) when short,
        mirroring the reference's all-or-nothing alloc (`kv_cache.py:104-112`)."""
        if n > len(self._free):
            return None
        if n == 0:
            return []
        pages = self._free[-n:]
        del self._free[-n:]
        return pages

    def free(self, pages: list[int]) -> None:
        self._free.extend(pages)
        assert len(self._free) <= self.num_pages, "double free detected"
