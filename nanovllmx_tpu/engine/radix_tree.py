"""Page-granular radix tree prefix cache.

SGLang-style radix tree with the same semantics as the reference
(`nanovllmx/core/kv_cache.py:119-310`): keys are token-id sequences, values are
KV storage indices, nodes split on partial match, paths are ref-count locked,
and eviction is LRU over unlocked leaves. Two deliberate departures:

* **Page granularity.** The reference maps every token to its own KV slot
  (page_size=1, `layers/attention.py:66`). Here values are page ids covering
  `page_size` tokens each; node keys always hold a whole number of pages and
  splits happen only at page boundaries. A prefix match that ends mid-page is
  truncated to the last full page (SURVEY.md §7.3 item 6).
* **Admission-time reuse.** The reference only uses the tree for storage dedup
  of finished sequences (SURVEY.md §5); here `match_prefix` is also called when
  a sequence is admitted so cached pages are adopted and their tokens skipped
  in prefill.

Ownership model (same as reference): a page is owned by exactly one tree node
or one running sequence; `insert` dedups double-stored pages, `ref_count` locks
a node path against eviction while running sequences use its pages.
"""

from __future__ import annotations

import heapq
from typing import Iterable


class RadixNode:
    __slots__ = ("parent", "children", "key", "pages", "ref_count", "access_time")

    def __init__(self, parent: "RadixNode | None" = None):
        self.parent = parent
        # child key: tuple of the child's first `page_size` token ids
        self.children: dict[tuple, RadixNode] = {}
        self.key: tuple = ()        # token ids; len(key) % page_size == 0
        self.pages: list[int] = []  # len == len(key) // page_size
        self.ref_count = 0
        self.access_time = 0

    @property
    def num_pages(self) -> int:
        return len(self.pages)

    def is_leaf(self) -> bool:
        return not self.children

    # ordering for the eviction heap
    def __lt__(self, other: "RadixNode") -> bool:
        return self.access_time < other.access_time


class RadixTree:
    def __init__(self, page_size: int):
        self.page_size = page_size
        self.root = RadixNode()
        self.root.ref_count = 1  # the root is never evicted
        self._clock = 0
        self.num_cached_pages = 0

    # ------------------------------------------------------------------ utils

    def _tick(self) -> int:
        self._clock += 1
        return self._clock

    def _page_chunks(self, tokens) -> list[tuple]:
        ps = self.page_size
        n = len(tokens) // ps  # only whole pages participate
        return [tuple(tokens[i * ps : (i + 1) * ps]) for i in range(n)]

    def _split(self, node: RadixNode, num_pages: int) -> RadixNode:
        """Split `node` so its first `num_pages` pages become a new parent
        node; `node` keeps the remainder. Page-boundary analogue of the
        reference split (`kv_cache.py:293-310`). Returns the new upper node."""
        ps = self.page_size
        assert 0 < num_pages < node.num_pages
        upper = RadixNode(parent=node.parent)
        upper.key = node.key[: num_pages * ps]
        upper.pages = node.pages[:num_pages]
        upper.ref_count = node.ref_count
        upper.access_time = node.access_time

        node.key = node.key[num_pages * ps :]
        node.pages = node.pages[num_pages:]
        node.parent = upper

        parent = upper.parent
        parent.children[upper.key[:ps]] = upper
        upper.children[node.key[:ps]] = node
        return upper

    # ------------------------------------------------------------- operations

    def match_prefix(self, tokens) -> tuple[list[int], RadixNode]:
        """Longest page-aligned cached prefix of `tokens`.

        Returns (pages, last_node): the cached pages covering the prefix and
        the deepest node on the path (lock it with `lock()` to pin the pages).
        Splits nodes as needed so `last_node` ends exactly at the match point,
        like the reference (`kv_cache.py:159-184`).
        """
        chunks = self._page_chunks(tokens)
        now = self._tick()
        node = self.root
        node.access_time = now
        pages: list[int] = []
        i = 0
        while i < len(chunks):
            child = node.children.get(chunks[i])
            if child is None:
                break
            # count matching pages within the child
            child_chunks = self._page_chunks(child.key)
            j = 0
            while (
                i + j < len(chunks)
                and j < len(child_chunks)
                and chunks[i + j] == child_chunks[j]
            ):
                j += 1
            if j < len(child_chunks):
                child = self._split(child, j)
            child.access_time = now
            pages.extend(child.pages)
            i += j
            node = child
        return pages, node

    def insert(self, tokens, pages: list[int]) -> tuple[list[int], list[int], RadixNode]:
        """Insert a page-aligned token sequence owned by `pages`.

        Where a prefix is already cached, the caller's pages for that range are
        duplicates to be freed (unless they ARE the canonical pages, i.e. the
        sequence adopted them at admission). Mirrors the reference's dedup in
        `cache_sequence` (`kv_cache.py:333-369`).

        Returns (dup_pages_to_free, canonical_pages, last_node).
        """
        chunks = self._page_chunks(tokens)
        assert len(pages) >= len(chunks), "insert needs one page per full chunk"
        now = self._tick()
        node = self.root
        node.access_time = now
        canonical: list[int] = []
        dups: list[int] = []
        i = 0
        while i < len(chunks):
            child = node.children.get(chunks[i])
            if child is None:
                # new node holds the remaining chunks, owned by the tree now
                new = RadixNode(parent=node)
                ps = self.page_size
                new.key = tuple(tokens[i * ps : len(chunks) * ps])
                new.pages = pages[i : len(chunks)]
                new.access_time = now
                node.children[chunks[i]] = new
                self.num_cached_pages += len(new.pages)
                canonical.extend(new.pages)
                return dups, canonical, new
            child_chunks = self._page_chunks(child.key)
            j = 0
            while (
                i + j < len(chunks)
                and j < len(child_chunks)
                and chunks[i + j] == child_chunks[j]
            ):
                j += 1
            if j < len(child_chunks):
                child = self._split(child, j)
            child.access_time = now
            # pages [i, i+j) are already cached in `child` — dedup
            for k in range(j):
                mine, theirs = pages[i + k], child.pages[k]
                if mine != theirs:
                    dups.append(mine)
            canonical.extend(child.pages)
            i += j
            node = child
        return dups, canonical, node

    def lock(self, node: RadixNode) -> None:
        """Pin the path root..node against eviction (ref `kv_cache.py:222-226`)."""
        while node is not None:
            node.ref_count += 1
            node = node.parent

    def unlock(self, node: RadixNode) -> None:
        while node is not None:
            assert node.ref_count > 0, "unlock underflow"
            node.ref_count -= 1
            node = node.parent

    def evict(self, num_pages: int) -> list[int]:
        """Evict least-recently-used unlocked leaves until `num_pages` pages
        are reclaimed (or nothing evictable remains). Returns the freed pages.
        LRU-heap over leaves, re-pushing parents that become leaves, as in the
        reference (`kv_cache.py:233-256`)."""
        freed: list[int] = []
        heap = [n for n in self._iter_leaves() if n.ref_count == 0]
        heapq.heapify(heap)
        while heap and len(freed) < num_pages:
            node = heapq.heappop(heap)
            if node.ref_count != 0 or node.children or node is self.root:
                continue  # stale entry
            freed.extend(node.pages)
            self.num_cached_pages -= len(node.pages)
            parent = node.parent
            del parent.children[node.key[: self.page_size]]
            if parent is not self.root and parent.is_leaf() and parent.ref_count == 0:
                heapq.heappush(heap, parent)
        return freed

    def _iter_leaves(self) -> Iterable[RadixNode]:
        stack = [self.root]
        while stack:
            node = stack.pop()
            if node.is_leaf() and node is not self.root:
                yield node
            stack.extend(node.children.values())


class NativeRadixTree:
    """Adapter over the C++ radix tree (nanovllmx_tpu/native/radix.cc) with
    the same interface as `RadixTree`; nodes are integer handles (0 = root)."""

    def __init__(self, page_size: int, native_mod):
        self.page_size = page_size
        self._t = native_mod.RadixTree(page_size=page_size)
        self.root = 0

    def match_prefix(self, tokens):
        return self._t.match_prefix(list(tokens))

    def insert(self, tokens, pages):
        return self._t.insert(list(tokens), list(pages))

    def lock(self, node):
        self._t.lock(node)

    def unlock(self, node):
        self._t.unlock(node)

    def evict(self, num_pages):
        return self._t.evict(num_pages)

    @property
    def num_cached_pages(self):
        return self._t.num_cached_pages


def make_radix_tree(page_size: int):
    """Native C++ tree when buildable, Python fallback otherwise."""
    from nanovllmx_tpu.native import load_native

    mod = load_native()
    if mod is not None:
        return NativeRadixTree(page_size, mod)
    return RadixTree(page_size)
