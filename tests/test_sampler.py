"""Sampler unit tests (CPU jax).

Trials are vectorized as batch rows (each row gets independent Gumbel noise
from the same key), so every test is one or two device calls.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nanovllmx_tpu.ops.sampler import sample


def _call(logits, temps, top_ps=None, top_ks=None, min_ps=None, seed=0):
    B = logits.shape[0]
    return np.asarray(sample(
        jnp.asarray(logits, jnp.float32),
        jnp.asarray(temps, jnp.float32),
        jnp.asarray(top_ps if top_ps is not None else np.ones(B), jnp.float32),
        jnp.asarray(top_ks if top_ks is not None else -np.ones(B), jnp.int32),
        jnp.asarray(min_ps if min_ps is not None else np.zeros(B), jnp.float32),
        jax.random.PRNGKey(seed),
    ))


def _trials(row_logits, n, temps=1.0, top_ps=1.0, top_ks=-1, min_ps=0.0, seed=0):
    """Run n sampling trials as one batched call."""
    logits = np.tile(np.asarray(row_logits, np.float32), (n, 1))
    return _call(
        logits,
        np.full(n, temps, np.float32),
        np.full(n, top_ps, np.float32),
        np.full(n, top_ks, np.int32),
        np.full(n, min_ps, np.float32),
        seed=seed,
    )


def test_temperature_zero_is_greedy():
    logits = np.array([[0.1, 3.0, -1.0, 2.9], [5.0, 0.0, 0.0, 0.0]])
    for seed in range(3):
        out = _call(logits, [0.0, 0.0], seed=seed)
        assert out.tolist() == [1, 0]


def test_top_k_one_is_greedy():
    rng = np.random.default_rng(0)
    row = rng.normal(size=64)
    out = _trials(row, 50, top_ks=1)
    assert (out == row.argmax()).all()


def test_top_p_excludes_tail():
    # one dominant token (p ~ 0.97): top_p=0.5 must always pick it
    out = _trials([8.0, 1.0, 1.0, 1.0, 1.0], 100, top_ps=0.5)
    assert (out == 0).all()


def test_min_p_filters_low_prob():
    # min_p=0.5: only tokens with p >= 0.5*max survive -> tokens 0 and 1
    out = _trials([4.0, 3.9, 0.0, -2.0], 200, min_ps=0.5)
    seen = set(out.tolist())
    assert seen <= {0, 1} and len(seen) == 2


def test_sampling_distribution_roughly_matches_softmax():
    out = _trials(np.log([0.7, 0.2, 0.1]), 2000)
    freq = np.bincount(out, minlength=3) / len(out)
    assert abs(freq[0] - 0.7) < 0.05
    assert abs(freq[1] - 0.2) < 0.05


def test_mixed_greedy_and_sampling_rows():
    logits = np.array([[0.0, 9.0, 0.0], [9.0, 0.0, 0.0]])
    out = _call(logits, temps=[0.0, 1.0])
    assert out[0] == 1  # greedy row exact
    assert out[1] in (0, 1, 2)


def test_high_temperature_flattens():
    out = _trials([2.0, 1.0, 0.0, -1.0], 200, temps=50.0)
    assert len(set(out.tolist())) >= 3


def test_top_k_restricts_support():
    out = _trials([5.0, 4.9, 4.8, -1.0, -1.0], 200, top_ks=3)
    assert set(out.tolist()) <= {0, 1, 2}


def test_flat_distribution_top_k_beyond_subset_cap():
    """Exactness fallback (r3 VERDICT): top_k=1000 on a flat distribution
    must sample (nearly) uniformly over the top-1000 support — the old
    subset sampler silently clamped top_k to 128."""
    V = 4096
    rng = np.random.default_rng(0)
    # flat-ish: tiny jitter so top-k support is well-defined
    row = rng.normal(scale=1e-3, size=V).astype(np.float32)
    # value-based support: the kernel keeps tokens >= the k-th largest
    # value (boundary ties kept), matching the reference's sort semantics
    kth = np.sort(row)[::-1][999]
    support = set(np.nonzero(row >= kth)[0].tolist())
    n = 4096
    out = _trials(row, n, temps=1.0, top_ks=1000, seed=3)
    picked = set(out.tolist())
    assert picked <= support
    # uniform-ish over 1000 tokens: 4096 draws hit far more than 128
    # distinct tokens (the clamped sampler could never exceed 128)
    assert len(picked) > 800


def test_flat_distribution_top_p_nucleus_overflows_subset():
    """top_p=0.99 on a flat 4096-token distribution: the nucleus holds
    ~4055 tokens, far beyond the 128-token subset — the exact fallback
    must keep sampling from (nearly) the whole vocab."""
    V = 4096
    rng = np.random.default_rng(1)
    row = rng.normal(scale=1e-3, size=V).astype(np.float32)
    n = 4096
    out = _trials(row, n, temps=1.0, top_ps=0.99, seed=4)
    # ~63% distinct expected for uniform-with-replacement over ~4055
    assert len(set(out.tolist())) > 2000


def test_top_p_mass_measured_against_full_distribution():
    """A row where the subset holds ~all mass but top_p is measured on the
    FULL softmax: 3 tokens at high logits (p ~ 1/3 each) + huge tail.
    top_p=0.60 keeps exactly the first two sorted tokens (cum 2/3 > 0.60
    only after two), NOT one (renormalized-within-subset cum would still
    keep two here, but with mass leaking to the tail the boundary shifts:
    full-mass cum of token0 is < 1/3 < 0.6 - keep; cum-prob of token2 is
    ~2/3 > 0.6 - drop)."""
    V = 2048
    row = np.full(V, -10.0, np.float32)
    row[:3] = [10.0, 10.0 - 1e-4, 10.0 - 2e-4]
    out = _trials(row, 512, temps=1.0, top_ps=0.6, seed=5)
    assert set(out.tolist()) == {0, 1}


def _ref_support(row, top_p=1.0, top_k=-1, min_p=0.0):
    """Token support set under the REFERENCE's filter semantics
    (`nanovllmx/layers/sampler.py _apply_top_k_top_p/_apply_min_p`):
    top-k mask first, then top_p cumsum over the softmax of the top-k-MASKED
    logits (renormalized over survivors), then min_p on the post-filter
    softmax."""
    row = np.asarray(row, np.float64)
    V = row.size
    keep = np.ones(V, bool)
    if top_k > 0:
        kth = np.sort(row)[::-1][min(top_k, V) - 1]
        keep &= row >= kth  # boundary ties kept (masked_fill uses <)
    masked = np.where(keep, row, -np.inf)
    p = np.exp(masked - masked.max())
    p /= p.sum()
    order = np.argsort(-row, kind="stable")
    cum_excl = 0.0
    nucleus = np.zeros(V, bool)
    for idx in order:
        if not keep[idx]:
            continue
        if cum_excl < top_p:
            nucleus[idx] = True
        cum_excl += p[idx]
    keep &= nucleus
    if min_p > 0.0:
        p2 = np.where(keep, p, 0.0)
        p2 = p2 / p2.sum()
        keep &= p2 >= min_p * p2.max()
    return set(np.nonzero(keep)[0].tolist())


def test_top_p_renormalized_over_top_k_survivors():
    """top_k + top_p combined: the nucleus is measured on the softmax of
    the top-k-masked logits (reference semantics). Here the top-2 hold
    renormalized masses 0.6/0.4, so top_p=0.55 keeps ONLY the argmax —
    full-vocab mass (0.30/0.20 + tail) would have kept both."""
    V = 512
    row = np.full(V, 0.0, np.float32)
    tail_mass = 0.5
    row[:] = np.log(tail_mass / (V - 2))
    row[0] = np.log(0.30)
    row[1] = np.log(0.20)
    out = _trials(row, 256, temps=1.0, top_ps=0.55, top_ks=2, seed=7)
    assert set(out.tolist()) == {0}
    assert _ref_support(row, top_p=0.55, top_k=2) == {0}


def test_subset_support_matches_reference_randomized():
    """Randomized support-set equality against the reference semantics,
    subset fast path (top_k <= cap)."""
    rng = np.random.default_rng(11)
    for trial in range(4):
        V = 384
        row = rng.normal(scale=2.0, size=V).astype(np.float32)
        top_k = int(rng.integers(2, 32))
        top_p = float(rng.uniform(0.3, 0.95))
        ref = _ref_support(row, top_p=top_p, top_k=top_k)
        out = _trials(row, 2048, temps=1.0, top_ps=top_p, top_ks=top_k,
                      seed=100 + trial)
        picked = set(out.tolist())
        assert picked <= ref, (trial, sorted(picked - ref))
        if len(ref) <= 8:  # enough trials to cover a small support
            assert picked == ref, (trial, sorted(ref - picked))


def test_full_exact_support_matches_reference_renormalized():
    """top_k beyond the subset cap forces the full-vocab fallback; its
    nucleus must ALSO renormalize over top-k survivors. 200 near-equal top
    logits + heavy tail: top_p over the renormalized 200 keeps ~120 of
    them, far off the full-mass answer."""
    rng = np.random.default_rng(12)
    V = 2048
    row = np.full(V, -6.0, np.float32) + rng.normal(
        scale=1e-3, size=V).astype(np.float32)
    row[:200] += 6.0
    top_k, top_p = 200, 0.6
    ref = _ref_support(row, top_p=top_p, top_k=top_k)
    out = _trials(row, 4096, temps=1.0, top_ps=top_p, top_ks=top_k, seed=13)
    picked = set(out.tolist())
    assert picked <= ref
    assert len(picked) > 0.7 * len(ref)
