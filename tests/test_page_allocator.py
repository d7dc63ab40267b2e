from nanovllmx_tpu.engine.page_allocator import PageAllocator


def test_alloc_free_roundtrip():
    a = PageAllocator(8)
    assert a.num_free == 8
    p1 = a.alloc(3)
    assert len(p1) == 3 and len(set(p1)) == 3
    assert a.num_free == 5 and a.num_used == 3
    p2 = a.alloc(5)
    assert a.num_free == 0
    assert set(p1) | set(p2) == set(range(8))
    a.free(p1)
    assert a.num_free == 3


def test_alloc_all_or_nothing():
    a = PageAllocator(4)
    a.alloc(3)
    assert a.alloc(2) is None  # short: allocates nothing
    assert a.num_free == 1
    assert a.alloc(1) is not None


def test_alloc_zero():
    a = PageAllocator(2)
    assert a.alloc(0) == []
    assert a.num_free == 2


def test_lifo_reuse():
    a = PageAllocator(4)
    p = a.alloc(2)
    a.free(p)
    q = a.alloc(2)
    assert set(q) == set(p)
