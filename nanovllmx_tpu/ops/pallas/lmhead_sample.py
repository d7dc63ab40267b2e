"""Pallas TPU kernel: fused int8 lm_head matmul + Gumbel-max sampling.

The decode sampler's cost at B=256, V=152k is NOT the math — it is the
HBM round-trips of the [B, V] intermediates (measured per step via xprof,
r4): the int8 logits dot materialises a 155 MB f32 logits slab (0.49 ms),
`rng-bit-generator` writes another [B, V] u32 slab (0.27 ms), and the
fused gumbel+argmax reads both back (0.41 ms). This kernel streams the
int8 table once (the unavoidable read), generates the Gumbel noise
in-VMEM per tile with the TPU PRNG, and keeps a running argmax — no [B, V]
buffer ever exists.

Semantics = the XLA sampler's pure-Gumbel fast path (`ops/sampler.py`):
  argmax_v(logits_v + T * g_v),  g ~ Gumbel(0, 1)
which equals temperature-T softmax sampling (and exact argmax at T = 0).
Rows with top-k/top-p/min-p filters must NOT use this kernel — the runner
branches to the XLA sampler under `lax.cond` when any filter is active.

Only the tied int8 table layout is supported ({"w": int8 [V, H],
"scale": f32 [V]} — quantize_embed_rows): per-row activation quantization
in-kernel mirrors `compute_logits`' W8A8 math exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_V = 1024  # vocab rows per tile (1 MB int8 at H=1024)
NEG_BIG = -3.0e38


def _fast_log2(x):
    """log2 for x > 0: exponent extraction + degree-4 polynomial on the
    mantissa (max abs err ~3e-4 — noise-grade, like fast_exp2)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | 0x3F800000, jnp.float32
    )  # [1, 2)
    t = m - 1.0
    # minimax-ish fit of log2(1+t) on [0, 1]
    p = t * (1.4426950 + t * (-0.7181451 + t * (0.4452851 + t * (
        -0.2775677 + t * 0.1217970))))
    return e.astype(jnp.float32) + p


def _kernel(
    hs_seed_ref, h_ref, temps_ref, w_hbm, scale_hbm, o_ref,
    wbuf, sbuf, sem, ssem, h8buf, hsbuf, best, barg,
    *, V: int, H: int, TV: int, B: int, interpret: bool,
):
    nt = -(-V // TV)
    rem = V - (nt - 1) * TV  # rows in the last (possibly partial) tile
    if not interpret:
        # hardware PRNG; the stream advances across prng_random_bits calls
        pltpu.prng_seed(hs_seed_ref[0], hs_seed_ref[1])

    def random_bits(t):
        if not interpret:
            # int32 view; the logical shift below makes the top bits benign
            # (Mosaic has no uint32 -> f32 cast)
            return pltpu.prng_random_bits((B, TV)).astype(jnp.int32)
        # interpret mode (CPU): prng_seed has no lowering — use a murmur3
        # finalizer over (seed, element index) instead (noise-grade)
        row = jax.lax.broadcasted_iota(jnp.int32, (B, TV), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, TV), 1)
        x = (hs_seed_ref[0] * jnp.int32(-1640531527)
             + row * jnp.int32(40503) + (t * TV + col)).astype(jnp.uint32)
        x ^= x >> 16
        x *= jnp.uint32(0x85EBCA6B)
        x ^= x >> 13
        x *= jnp.uint32(0xC2B2AE35)
        x ^= x >> 16
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    # per-row activation quantization (matches linear._quant_rows)
    hf = h_ref[...].astype(jnp.float32)
    hs = jnp.maximum(
        jnp.max(jnp.abs(hf), axis=1, keepdims=True) / 127.0, 1e-8
    )
    h8buf[...] = jnp.round(hf / hs).astype(jnp.int8)
    hsbuf[...] = hs
    best[...] = jnp.full_like(best, NEG_BIG)
    barg[...] = jnp.zeros_like(barg)

    def start(t, slot):
        # scale_hbm is pre-tiled [nt, 1, TV] (wrapper pads + reshapes), so
        # the tile copy is a plain outer-dim slice
        pltpu.make_async_copy(
            scale_hbm.at[t], sbuf.at[slot], ssem.at[slot]
        ).start()

        @pl.when(t < nt - 1)
        def _():
            pltpu.make_async_copy(
                w_hbm.at[pl.ds(t * TV, TV)], wbuf.at[slot], sem.at[slot]
            ).start()

        @pl.when(t == nt - 1)  # partial tail tile (static size)
        def _():
            pltpu.make_async_copy(
                w_hbm.at[pl.ds((nt - 1) * TV, rem)],
                wbuf.at[slot, pl.ds(0, rem)], sem.at[slot],
            ).start()

    def wait(t, slot):
        pltpu.make_async_copy(
            sbuf.at[slot], sbuf.at[slot], ssem.at[slot]
        ).wait()
        n = jnp.where(t < nt - 1, TV, rem)

        @pl.when(n == TV)
        def _():
            pltpu.make_async_copy(
                wbuf.at[slot], wbuf.at[slot], sem.at[slot]
            ).wait()

        @pl.when(n != TV)
        def _():
            pltpu.make_async_copy(
                wbuf.at[slot, pl.ds(0, rem)], wbuf.at[slot, pl.ds(0, rem)],
                sem.at[slot],
            ).wait()

    start(0, 0)

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < nt)
        def _():
            start(t + 1, 1 - slot)

        wait(t, slot)
        acc = jax.lax.dot_general(
            h8buf[...], wbuf[slot],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B, TV]
        logits = acc.astype(jnp.float32) * hsbuf[...] * sbuf[slot]
        # Gumbel(0,1) = -ln(-ln u), u uniform (0,1):
        #   -ln u = log2(1/u) * ln2  ->  g = -ln(ln2 * log2(1/u))
        #         = -ln2 * log2(log2(1/u)) - ln(ln2)
        bits = random_bits(t)
        u24 = jax.lax.shift_right_logical(bits, 8).astype(
            jnp.float32
        ) * (1.0 / (1 << 24)) + (1.0 / (1 << 25))
        l2u = -_fast_log2(u24)                      # log2(1/u) > 0
        g = -0.6931472 * _fast_log2(l2u) + 0.3665129
        val = logits + temps_ref[...] * g
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, TV), 1)
        # tail-tile columns past V never win (garbage table rows)
        val = jnp.where(t * TV + lane < V, val, NEG_BIG)
        tile_max = jnp.max(val, axis=1, keepdims=True)      # [B, 1]
        tile_arg = jnp.min(
            jnp.where(val >= tile_max, lane + t * TV, jnp.int32(V)),
            axis=1, keepdims=True,
        )
        better = tile_max > best[...]
        best[...] = jnp.where(better, tile_max, best[...])
        barg[...] = jnp.where(better, tile_arg, barg[...])
        return 0

    jax.lax.fori_loop(0, nt, body, 0)
    o_ref[...] = barg[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_lmhead_sample(
    hidden: jax.Array,   # [B, H]
    w8: jax.Array,       # [V, H] int8 (tied embedding table)
    wscale: jax.Array,   # [V] f32 per-row scales
    temps: jax.Array,    # [B] f32; 0 => greedy
    seed: jax.Array,     # [>=3] uint32/int32 PRNG seed words
    interpret: bool = False,
) -> jax.Array:          # [B] int32 sampled token ids
    B, H = hidden.shape
    V = w8.shape[0]
    TV = TILE_V
    nt = -(-V // TV)
    # pre-tile the scale vector to [nt, 1, TV] so tile DMAs are outer-dim
    # slices (1-D HBM<->2-D VMEM copies hit a Mosaic tiling mismatch)
    wscale = jnp.pad(
        wscale.astype(jnp.float32), (0, nt * TV - V)
    ).reshape(nt, 1, TV)
    out = pl.pallas_call(
        functools.partial(
            _kernel, V=V, H=H, TV=TV, B=B, interpret=interpret
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hidden
            pl.BlockSpec(memory_space=pltpu.VMEM),  # temps
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # table
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # row scales
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, TV, H), jnp.int8),       # table tiles
            pltpu.VMEM((2, 1, TV), jnp.float32),    # scale tiles
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((B, H), jnp.int8),           # quantized hidden
            pltpu.VMEM((B, 1), jnp.float32),        # row scales
            pltpu.VMEM((B, 1), jnp.float32),        # running max
            pltpu.VMEM((B, 1), jnp.int32),          # running argmax
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32)[:3], hidden,
        temps.astype(jnp.float32).reshape(B, 1), w8, wscale,
    )
    return out[:, 0]
