"""KV cache manager: page allocator + radix tree glue.

Counterpart of the reference `KVCacheManager` (`nanovllmx/core/kv_cache.py:312-369`)
with page granularity and admission-time prefix reuse (SURVEY.md §5: the
reference only dedups storage on finish; here matched pages are adopted when a
sequence is admitted so their tokens are skipped in prefill).
"""

from __future__ import annotations

from nanovllmx_tpu.engine.page_allocator import PageAllocator
from nanovllmx_tpu.engine.radix_tree import RadixNode, RadixTree, make_radix_tree
from nanovllmx_tpu.engine.sequence import Sequence


class KVCacheManager:
    def __init__(self, num_pages: int, page_size: int,
                 enable_prefix_caching: bool = True, tree=None):
        self.page_size = page_size
        self.allocator = PageAllocator(num_pages)
        # native C++ tree when available; same semantics either way
        self.tree = tree if tree is not None else make_radix_tree(page_size)
        self.enable_prefix_caching = enable_prefix_caching
        # seq_id -> locked tree node (admission-time prefix lock)
        self._locks: dict[str, RadixNode] = {}

    # ------------------------------------------------------------- allocation

    @property
    def num_free_pages(self) -> int:
        return self.allocator.num_free

    def alloc_pages(self, n: int) -> list[int] | None:
        """Allocate, evicting cold cache entries if needed; None when truly
        out of memory (caller preempts). Evict-then-retry like the reference
        `alloc_slots` (`kv_cache.py:319-328`), but returning None instead of
        raising so the scheduler can preempt."""
        pages = self.allocator.alloc(n)
        if pages is not None:
            return pages
        short = n - self.allocator.num_free
        self.allocator.free(self.tree.evict(short))
        return self.allocator.alloc(n)

    # -------------------------------------------------------------- admission

    def match_and_lock(self, seq: Sequence) -> int:
        """Admission-time prefix match: adopt cached pages for the longest
        page-aligned prefix of the prompt (capped so at least one token is
        left to compute, since prefill must produce last-token logits).

        Sets seq.page_ids / cached_len / shared_len; locks the tree path.
        Returns the number of reused tokens."""
        if not self.enable_prefix_caching:
            return 0
        assert not seq.page_ids, "match_and_lock on a seq with pages"
        # cap: leave >= 1 token to compute
        usable = seq.total_len - 1
        pages, node = self.tree.match_prefix(seq.token_ids[:usable])
        if node == self.tree.root:
            return 0
        self.tree.lock(node)
        self._locks[seq.seq_id] = node
        matched = len(pages) * self.page_size
        seq.page_ids = list(pages)
        seq.cached_len = matched
        seq.shared_len = matched
        return matched

    # ----------------------------------------------------------------- finish

    def release(self, seq: Sequence) -> None:
        """Free a sequence's KV state without caching it (abort / preempt):
        private pages go back to the allocator, the admission lock is dropped."""
        shared_pages = seq.shared_len // self.page_size
        self.allocator.free(seq.page_ids[shared_pages:])
        seq.page_ids = []
        node = self._locks.pop(seq.seq_id, None)
        if node is not None:
            self.tree.unlock(node)

    def cache_finished(self, seq: Sequence) -> None:
        """Insert a finished sequence's KV into the prefix cache
        (ref `cache_sequence`, `kv_cache.py:333-369`).

        Full pages become tree-owned (deduped against existing entries);
        the trailing partial page, if any, cannot be shared and is freed.
        """
        if not self.enable_prefix_caching:
            self.allocator.free(seq.page_ids)
            seq.page_ids = []
            return
        ps = self.page_size
        cached_tokens = seq.cached_len  # tokens with KV actually materialised
        full_pages = cached_tokens // ps
        dups, _canonical, _node = self.tree.insert(
            seq.token_ids[: full_pages * ps], seq.page_ids[:full_pages]
        )
        self.allocator.free(dups)
        # trailing partial page is private and unshareable
        self.allocator.free(seq.page_ids[full_pages:])
        seq.page_ids = []
        node = self._locks.pop(seq.seq_id, None)
        if node is not None:
            self.tree.unlock(node)

    # ------------------------------------------------------------------ stats

    @property
    def num_cached_pages(self) -> int:
        return self.tree.num_cached_pages
