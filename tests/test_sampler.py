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
