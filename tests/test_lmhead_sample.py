"""Fused int8 lm_head + Gumbel-max sampler kernel (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nanovllmx_tpu.ops.pallas.lmhead_sample import fused_lmhead_sample


def _table(rng, V, H):
    w = rng.normal(size=(V, H)).astype(np.float32)
    amax = np.abs(w).max(axis=1)
    scale = np.maximum(amax / 127.0, 1e-8)
    w8 = np.rint(w / scale[:, None]).astype(np.int8)
    return w8, scale.astype(np.float32), w8.astype(np.float32) * scale[:, None]


def test_greedy_matches_argmax():
    rng = np.random.default_rng(0)
    B, H, V = 8, 128, 2048 + 384  # exercises the partial tail tile
    w8, scale, wf = _table(rng, V, H)
    h = rng.normal(size=(B, H)).astype(np.float32)
    toks = np.asarray(fused_lmhead_sample(
        jnp.asarray(h), jnp.asarray(w8), jnp.asarray(scale),
        jnp.zeros(B, jnp.float32), jnp.asarray([1, 2, 3], jnp.int32),
        interpret=True,
    ))
    # reference: same W8A8 math as compute_logits
    hs = np.maximum(np.abs(h).max(axis=1, keepdims=True) / 127.0, 1e-8)
    h8 = np.rint(h / hs)
    logits = (h8 @ w8.T.astype(np.float32)) * hs * scale[None, :]
    np.testing.assert_array_equal(toks, logits.argmax(axis=1))


def test_sampling_distribution_tracks_softmax():
    rng = np.random.default_rng(1)
    H, V = 128, 1024
    w8, scale, wf = _table(rng, V, H)
    h_row = rng.normal(size=H).astype(np.float32) * 0.5
    B = 512  # trials as batch rows (independent noise per row)
    h = np.tile(h_row, (B, 1))
    T = 1.0
    toks = np.asarray(fused_lmhead_sample(
        jnp.asarray(h), jnp.asarray(w8), jnp.asarray(scale),
        jnp.full(B, T, jnp.float32), jnp.asarray([7, 8, 9], jnp.int32),
        interpret=True,
    ))
    hs = np.maximum(np.abs(h_row).max() / 127.0, 1e-8)
    h8 = np.rint(h_row / hs)
    logits = (h8 @ w8.T.astype(np.float32)) * hs * scale
    p = np.exp(logits / T - (logits / T).max())
    p /= p.sum()
    # the head of the distribution should be sampled at roughly its mass
    top = np.argsort(-p)[:5]
    for v in top:
        freq = (toks == v).mean()
        assert abs(freq - p[v]) < 0.06 + 0.5 * p[v], (v, freq, p[v])
    # temperature 0 rows in the same batch stay greedy
    temps = np.zeros(B, np.float32)
    temps[::2] = T
    toks2 = np.asarray(fused_lmhead_sample(
        jnp.asarray(h), jnp.asarray(w8), jnp.asarray(scale),
        jnp.asarray(temps), jnp.asarray([7, 8, 9], jnp.int32),
        interpret=True,
    ))
    assert np.all(toks2[1::2] == logits.argmax())
