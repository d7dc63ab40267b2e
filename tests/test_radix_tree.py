"""Radix-tree prefix cache unit tests (page granularity).

Covers the behaviors the reference implements at token granularity
(`/root/reference/nanovllmx/core/kv_cache.py:119-310`): match with node split,
insert with dedup, path locking, LRU leaf eviction — plus the page-boundary
truncation rule specific to this design. Every test runs against BOTH the
Python implementation and the native C++ one (nanovllmx_tpu/native/radix.cc).
"""

import pytest

from nanovllmx_tpu.engine.radix_tree import NativeRadixTree, RadixTree
from nanovllmx_tpu.native import load_native

PS = 4  # page size for tests

_native = load_native()


@pytest.fixture(params=["python", "native"])
def make_tree(request):
    if request.param == "python":
        return lambda: RadixTree(PS)
    if _native is None:
        pytest.skip("native extension unavailable")
    return lambda: NativeRadixTree(PS, _native)


def test_empty_match(make_tree):
    t = make_tree()
    pages, node = t.match_prefix([1, 2, 3, 4, 5])
    assert pages == [] and node == t.root


def test_insert_then_match_exact(make_tree):
    t = make_tree()
    tokens = list(range(8))  # 2 pages
    dups, canon, node = t.insert(tokens, [10, 11])
    assert dups == [] and canon == [10, 11]
    assert t.num_cached_pages == 2
    pages, n2 = t.match_prefix(tokens)
    assert pages == [10, 11] and n2 == node


def test_partial_page_match_truncates_to_page_boundary(make_tree):
    t = make_tree()
    t.insert(list(range(8)), [10, 11])
    # query shares first page fully, second page only partially
    query = [0, 1, 2, 3, 4, 5, 99, 100]
    pages, node = t.match_prefix(query)
    assert pages == [10]  # only the full first page reusable
    assert node != t.root


def test_mid_page_divergence_no_reuse(make_tree):
    t = make_tree()
    t.insert(list(range(8)), [10, 11])
    query = [0, 1, 2, 99, 4, 5, 6, 7]  # diverges inside the first page
    pages, node = t.match_prefix(query)
    assert pages == [] and node == t.root


def test_insert_dedup_frees_duplicates(make_tree):
    t = make_tree()
    t.insert(list(range(8)), [10, 11])
    # second sequence with the same first 2 pages + 1 new page
    tokens = list(range(8)) + [100, 101, 102, 103]
    dups, canon, node = t.insert(tokens, [20, 21, 22])
    assert sorted(dups) == [20, 21]  # duplicate storage for shared prefix
    assert canon == [10, 11, 22]
    assert t.num_cached_pages == 3


def test_insert_same_pages_not_duplicated(make_tree):
    # a sequence that ADOPTED canonical pages at admission re-inserts them
    t = make_tree()
    t.insert(list(range(8)), [10, 11])
    tokens = list(range(8)) + [100, 101, 102, 103]
    dups, canon, _ = t.insert(tokens, [10, 11, 22])
    assert dups == []  # its pages ARE the canonical pages
    assert canon == [10, 11, 22]


def test_split_on_divergence_at_page_boundary(make_tree):
    t = make_tree()
    t.insert(list(range(12)), [1, 2, 3])  # 3 pages
    # shares pages 0-1, diverges at page 2
    tokens = list(range(8)) + [50, 51, 52, 53]
    dups, canon, _ = t.insert(tokens, [7, 8, 9])
    assert sorted(dups) == [7, 8]
    assert canon == [1, 2, 9]
    # both suffixes reachable
    assert t.match_prefix(list(range(12)))[0] == [1, 2, 3]
    assert t.match_prefix(tokens)[0] == [1, 2, 9]
    assert t.num_cached_pages == 4


def test_lock_blocks_eviction(make_tree):
    t = make_tree()
    _, _, node = t.insert(list(range(8)), [10, 11])
    t.lock(node)
    assert t.evict(2) == []
    t.unlock(node)
    freed = t.evict(2)
    assert sorted(freed) == [10, 11]
    assert t.num_cached_pages == 0


def test_lru_eviction_order(make_tree):
    t = make_tree()
    t.insert([0, 0, 0, 0], [1])
    t.insert([9, 9, 9, 9], [2])
    t.match_prefix([0, 0, 0, 0])  # touch the first entry: now MRU
    freed = t.evict(1)
    assert freed == [2]  # LRU leaf evicted first
    assert t.match_prefix([0, 0, 0, 0])[0] == [1]


def test_evict_cascades_to_parent(make_tree):
    t = make_tree()
    t.insert(list(range(8)), [1, 2])
    t.insert(list(range(4)) + [50, 51, 52, 53], [1, 3])
    # tree: parent [page 1] with children [page 2] and [page 3]
    freed = t.evict(3)
    assert sorted(freed) == [1, 2, 3]
    assert t.num_cached_pages == 0


def test_evict_partial_need(make_tree):
    t = make_tree()
    t.insert([0, 0, 0, 0], [1])
    t.insert([9, 9, 9, 9], [2])
    freed = t.evict(1)
    assert len(freed) == 1
    assert t.num_cached_pages == 1


def test_lock_after_split_protects_prefix(make_tree):
    # lock a node, then a later match splits deeper structure: the locked
    # path must stay pinned
    t = make_tree()
    _, _, node = t.insert(list(range(12)), [1, 2, 3])
    pages, mnode = t.match_prefix(list(range(8)))  # splits at 2 pages
    t.lock(mnode)
    assert t.evict(10) == [3] or sorted(t.evict(10)) == []  # only tail free
    t.unlock(mnode)
    freed = t.evict(10)
    assert t.num_cached_pages == 0


def test_deep_chain_many_inserts(make_tree):
    t = make_tree()
    base = []
    for i in range(10):
        base = base + [i] * PS
        t.insert(list(base), list(range(i + 1)))
    assert t.num_cached_pages == 10
    pages, _ = t.match_prefix(base)
    assert pages == list(range(10))
    # evict everything
    freed = t.evict(100)
    assert sorted(freed) == list(range(10))
