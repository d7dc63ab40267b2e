"""Pallas TPU kernel: scatter new K/V token rows into the paged pool.

Role of the reference's Triton store-KV kernel (`core/kv_cache.py:12-44`),
and the performance fix for XLA's scatter lowering: a token row is
[nkv, hd] int8 = a SUB-TILE of the (32, 128) int8 layout, so `.at[idx].set`
becomes a read-modify-write per row and costs ~3.4 ms per decode step on
v5e (measured, benchmarks/probe_forward_ablate.py). Here each row is one
direct VMEM -> HBM DMA descriptor (~0.15 us issue, fully overlapped):
2 x 256 copies per decode step cost ~0.1 ms.

The pool rides through as an input/output-aliased HBM ref, so the update is
in place inside the layer scan (no copy of the multi-GB pool). OOB slots
(padding rows, the reference's -1 sentinel) are skipped by a predicate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _write_kernel(idx_ref, kv_rows_ref, pool_ref, out_ref, sem, *, T: int):
    """idx_ref: SMEM [2N] flat token-row indices (OOB to skip);
    kv_rows_ref: VMEM [2N, nkv, hd] rows to store; pool_ref/out_ref: the
    aliased flat pool [T, nkv, hd] in HBM."""
    n = idx_ref.shape[0]

    def start(i, carry):
        @pl.when(idx_ref[i] < T)
        def _():
            pltpu.make_async_copy(
                kv_rows_ref.at[i], out_ref.at[idx_ref[i]], sem
            ).start()
        return carry

    def wait(i, carry):
        @pl.when(idx_ref[i] < T)
        def _():
            pltpu.make_async_copy(
                kv_rows_ref.at[0], out_ref.at[0], sem
            ).wait()
        return carry

    jax.lax.fori_loop(0, n, start, 0)
    jax.lax.fori_loop(0, n, wait, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scatter_kv_rows(
    pool_flat: jax.Array,   # [T, nkv, hd] flat token-row view of the pool
    kv_rows: jax.Array,     # [2N, nkv, hd] rows to write (K then V halves)
    idx: jax.Array,         # [2N] int32 flat row indices; >= T skipped
    interpret: bool = False,
) -> jax.Array:
    T = pool_flat.shape[0]
    return pl.pallas_call(
        functools.partial(_write_kernel, T=T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(pool_flat.shape, pool_flat.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, kv_rows, pool_flat)
