"""Pallas TPU kernel: fused INT4 dequant matmul (weight-only, per-group scales).

The reference has no quantization at all (SURVEY.md §2.4); INT4 is added
scope per BASELINE.json config 4 (INT4 TP=8). Design:

* Weights are stored PACKED, two 4-bit values per byte, so the HBM stream is
  half the int8 size — the point of int4 for HBM-bound decode. Packing is
  **split-half**: byte row `r` of `wp [K/2, N]` holds unpacked row `r` in its
  low nibble and row `r + K/2` in its high nibble (offset-8 storage: nibble =
  value + 8 in [1, 15]). Unpacking is therefore two contiguous row ranges —
  no sublane interleave in VMEM (a [K/2, 2, N]-style interleave would need a
  relayout Mosaic does poorly).
* Per-group scales: group g covers unpacked rows [g*G, (g+1)*G); G divides
  K/2 (quantize_int4 shrinks G via gcd when needed) so every group lives
  entirely in one nibble half.
* W8A8-style compute: activations arrive row-quantized to int8 (one f32
  scale per row, computed by the caller); each group runs one int8 MXU dot
  [TM, G] @ [G, TN] -> int32, scaled by scale[g, n] and accumulated in f32.
  This keeps the MXU at int8 rate (2x bf16) like the int8 path in
  ops/linear.py.

Grid: (M tiles, N tiles). Weight tiles stream HBM->VMEM once per M tile;
decode (M <= 256) has one M tile, so weights stream exactly once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xq_ref, xs_ref, wp_ref, scale_ref, o_ref, *, G: int, K: int):
    ng = K // G
    nh = (K // 2) // G  # groups per nibble half
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g in range(ng):
        if g < nh:
            w32 = wp_ref[pl.ds(g * G, G), :].astype(jnp.int32) & 15
        else:
            w32 = wp_ref[pl.ds((g - nh) * G, G), :].astype(jnp.int32) >> 4
        w8 = (w32 - 8).astype(jnp.int8)  # [G, TN]
        x_g = xq_ref[:, pl.ds(g * G, G)]  # [TM, G] int8
        part = jax.lax.dot_general(
            x_g, w8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + part.astype(jnp.float32) * scale_ref[g, :][None, :]
    o_ref[...] = acc * xs_ref[...]


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def int4_matmul_pallas(
    xq: jax.Array,     # [M, K] int8 row-quantized activations
    xs: jax.Array,     # [M, 1] f32 per-row activation scales
    wp: jax.Array,     # [K//2, N] uint8 split-half packed int4 weights
    scale: jax.Array,  # [ng, N] f32 per-group weight scales
    group_size: int,
    interpret: bool = False,
) -> jax.Array:        # [M, N] f32
    M, K = xq.shape
    K2, N = wp.shape
    assert K == 2 * K2, (K, K2)
    ng = scale.shape[0]
    G = group_size
    assert ng * G == K and (K // 2) % G == 0, (K, G, ng)

    TM = min(256, -(-M // 8) * 8)
    Mp = -(-M // TM) * TM
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        xs = jnp.pad(xs, ((0, Mp - M), (0, 0)))
    TN = 256 if N % 256 == 0 else N

    out = pl.pallas_call(
        functools.partial(_kernel, G=G, K=K),
        grid=(Mp // TM, N // TN),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j: (i, 0)),
            pl.BlockSpec((TM, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((K2, TN), lambda i, j: (0, j)),
            pl.BlockSpec((ng, TN), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        interpret=interpret,
    )(xq, xs, wp, scale)
    return out[:M] if Mp != M else out
