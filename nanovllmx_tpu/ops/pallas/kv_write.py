"""Pallas TPU kernels: store new K/V token rows (+ int8 scales) into the pool.

Role of the reference's Triton store-KV kernel (`core/kv_cache.py:12-44`),
and the performance fix for XLA's scatter lowering: a token row is
[nkv, hd] int8 = a SUB-TILE of the (32, 128) int8 layout, so `.at[idx].set`
becomes a read-modify-write per row and costs ~3.4 ms per decode step on
v5e (measured, benchmarks/probe_forward_ablate.py). Here each row is one
direct DMA descriptor (~1 us issue, overlapped).

Quantized pools also carry per-token f32 scales in 128-lane rows (one row
per page at ps=128, `ops/attention.py`). Updating single lanes of those
rows through XLA costs ~1 ms per decode step (row gather + where + scatter
forces a pass over the plane) and ~5 ms per prefill step. Both kernels here
take the scale plane as an ALIASED ref and read-modify-write only the
touched rows:

* `scatter_kv_rows` — decode path: scattered single-token rows. Requires
  each scale target to live in a DISTINCT row (decode guarantees this:
  one token per sequence, pages are per-sequence exclusive) because rows
  are merged vectorized; duplicate rows would drop lanes.
* `store_kv_prefill` — prefill path: each sequence writes a CONTIGUOUS
  token run, so KV rows go as host-planned block DMAs (full 128-row pages
  + 16-row blocks + single rows) and scale rows are built whole (host
  passes per-page lane masks; new lane values are gathered in-graph).

Both kernels receive the pool and the scale plane in their NATIVE shapes
([L, 2, P, ps, nkv, hd] / [L, 2, S128, 128]) and alias them in place
inside the layer scan. A flat `.reshape` view at the call boundary forced
XLA layout assignment to COPY the whole 57 MB scale plane per layer per
prefill step (measured: ~15 of 27 ms; the custom call's layout constraint
did not match the carried array's). OOB entries (padding, the reference's
-1 sentinel) are skipped by a predicate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(
    layer_ref, slots_ref, kv_rows_ref, pool_ref, out_ref, sem, *,
    ps: int, PT: int, N: int,
):
    """slots_ref: SMEM [N] plane-local token slots (>= PT to skip);
    kv_rows_ref: VMEM [N, 2, nkv, hd] interleaved K|V rows per token —
    one descriptor covers BOTH planes (the K and V rows of a token slot
    sit a plane stride apart, which a [2, nkv, hd] strided dst expresses);
    pool_ref/out_ref: the aliased pool [L, 2, P, ps, nkv, hd] in HBM."""
    layer = layer_ref[0]

    def start(i, carry):
        s = slots_ref[i]

        @pl.when(s < PT)
        def _():
            pltpu.make_async_copy(
                kv_rows_ref.at[i],
                out_ref.at[layer, :, s // ps, s % ps],
                sem,
            ).start()
        return carry

    def wait(i, carry):
        @pl.when(slots_ref[i] < PT)
        def _():
            pltpu.make_async_copy(
                kv_rows_ref.at[0], out_ref.at[0, :, 0, 0], sem
            ).wait()
        return carry

    jax.lax.fori_loop(0, N, start, 0)
    jax.lax.fori_loop(0, N, wait, 0)


def _scatter_scales_kernel(
    layer_ref, slots_ref, kv_rows_ref, slane_ref, sval_ref, pool_ref,
    plane_ref, out_ref, sout_ref, sem, ssem, sbuf, *,
    ps: int, PT: int, SR: int, N: int,
):
    """Combined row + scale-lane store (decode path, unique scale rows).

    Every descriptor covers BOTH planes per token (K and V rows / scale
    rows sit one plane stride apart): N row stores + N scale reads + N
    scale writes — half the descriptor count of the per-(plane, token)
    schedule, and descriptor issue is the serial cost of this kernel.

    slots_ref: SMEM [N] plane-local token slots;
    kv_rows_ref: VMEM [N, 2, nkv, hd] interleaved K|V rows;
    slane_ref/sval_ref: VMEM [N, 1] lane ids / [N, 2, 1] new K|V scales;
    sout_ref: aliased scale plane [L, 2, S128, 128] f32 in HBM;
    sbuf: VMEM [N, 2, 128] staging for the touched row pairs."""
    layer = layer_ref[0]

    def start_rows(i, carry):
        s = slots_ref[i]

        @pl.when(s < PT)
        def _():
            pltpu.make_async_copy(
                kv_rows_ref.at[i],
                out_ref.at[layer, :, s // ps, s % ps],
                sem,
            ).start()
        return carry

    def start_reads(i, carry):
        s = slots_ref[i]

        @pl.when(s // 128 < SR)
        def _():
            pltpu.make_async_copy(
                sout_ref.at[layer, :, s // 128], sbuf.at[i], ssem
            ).start()
        return carry

    def wait_reads(i, carry):
        @pl.when(slots_ref[i] // 128 < SR)
        def _():
            pltpu.make_async_copy(
                sout_ref.at[0, :, 0], sbuf.at[0], ssem
            ).wait()
        return carry

    jax.lax.fori_loop(0, N, start_rows, 0)
    jax.lax.fori_loop(0, N, start_reads, 0)
    jax.lax.fori_loop(0, N, wait_reads, 0)

    # vectorized lane merge: token i sets lane slane[i] of BOTH plane rows
    # to its K/V scales. Rows are unique per token (decode's exclusive
    # pages), so independent merges cannot drop each other's lanes.
    lanes = jax.lax.broadcasted_iota(jnp.int32, (N, 2, 128), 2)
    sbuf[...] = jnp.where(
        lanes == slane_ref[...][:, None, :], sval_ref[...], sbuf[...]
    )

    def start_writes(i, carry):
        s = slots_ref[i]

        @pl.when(s // 128 < SR)
        def _():
            pltpu.make_async_copy(
                sbuf.at[i], sout_ref.at[layer, :, s // 128], ssem
            ).start()
        return carry

    jax.lax.fori_loop(0, N, start_writes, 0)
    jax.lax.fori_loop(0, N, wait_reads, 0)

    def wait_rows(i, carry):
        @pl.when(slots_ref[i] < PT)
        def _():
            pltpu.make_async_copy(
                kv_rows_ref.at[0], out_ref.at[0, :, 0, 0], sem
            ).wait()
        return carry

    jax.lax.fori_loop(0, N, wait_rows, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scatter_kv_rows(
    pool: jax.Array,        # [L, 2, P, ps, nkv, hd]
    kv_rows: jax.Array,     # [N, 2, nkv, hd] interleaved K|V rows per token
    layer: jax.Array,       # [] or [1] int32
    slots: jax.Array,       # [N] int32 plane-local token slots; >= P*ps skip
    scale: jax.Array | None = None,   # [L, 2, S128, 128] f32
    svals: jax.Array | None = None,   # [2N] f32 new scales (K then V halves)
    interpret: bool = False,
):
    """Store token rows; optionally also set per-token scale lanes.

    kv_rows is token-major with K and V interleaved so one descriptor per
    token covers both planes. With scale args, returns (new_pool,
    new_scale); the scale target of token i is rows slots[i] // 128 of
    both planes, lane slots[i] % 128, and every valid target must be in a
    DISTINCT row (decode's unique-page guarantee). Requires ps % 128 == 0
    for the scale path (a page spans whole 128-lane scale rows).
    """
    L, _, P, ps, nkv, hd = pool.shape
    PT = P * ps
    N = slots.shape[0]
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    if scale is None:
        return pl.pallas_call(
            functools.partial(_scatter_kernel, ps=ps, PT=PT, N=N),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            input_output_aliases={3: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(layer, slots, kv_rows, pool)

    SR = scale.shape[2]
    slane = (slots % 128).astype(jnp.int32).reshape(N, 1)
    # [2N] K-then-V -> [N, 2, 1] token-major K|V pairs
    svals = svals.astype(jnp.float32).reshape(2, N).transpose(1, 0)[
        :, :, None
    ]
    return pl.pallas_call(
        functools.partial(
            _scatter_scales_kernel, ps=ps, PT=PT, SR=SR, N=N
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # layer
            pl.BlockSpec(memory_space=pltpu.SMEM),  # slots
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kv rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # slane
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sval
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),      # pool
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),      # scale plane
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(pool.shape, pool.dtype),
            jax.ShapeDtypeStruct(scale.shape, scale.dtype),
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((N, 2, 128), jnp.float32),
        ],
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(layer, slots, kv_rows, slane, svals, pool, scale)


class PrefillStorePlan:
    """Host-side run decomposition for `store_kv_prefill`.

    Each scheduled chunk is one contiguous token span; its per-page segments
    decompose into {128, 16, 1}-row block DMAs, and (ps == 128 pools) each
    touched page contributes one whole scale row with a lane mask + gather
    indices for the new per-token scales."""

    def __init__(self, F: int, G16: int, R: int, Sp: int, page_size: int):
        import numpy as np

        self.ps = page_size
        self.caps = (F, G16, R, Sp)
        self.full_dst = np.full(F, -1, np.int32)
        self.full_src = np.zeros(F, np.int32)
        self.b16_dst = np.full(G16, -1, np.int32)
        self.b16_src = np.zeros(G16, np.int32)
        self.row_dst = np.full(R, -1, np.int32)
        self.row_src = np.zeros(R, np.int32)
        self.spage = np.full(Sp, -1, np.int32)
        self.smask = np.zeros((Sp, 128), np.float32)
        # window start: new-scale lanes of entry i are a CONTIGUOUS source
        # run ks[swin0[i] + lane] for the smask-covered lanes, so the XLA
        # side reads them with a 128-wide dynamic-slice window per entry
        # instead of a per-ELEMENT gather (XLA lowered the [Sp, 128]
        # element gather at ~0.28 M elem/ms on v5e — 2.5 ms/prefill step)
        self.swin0 = np.zeros(Sp, np.int32)
        self.nf = self.n16 = self.nr = self.nsp = 0

    def add_span(self, start: int, end: int, pages, src_off: int) -> None:
        """Token span [start, end) of one sequence; pages = its page table
        (logical page i -> physical page id); src_off = the span's first row
        in the packed kv_rows buffer."""
        import numpy as np

        ps = self.ps
        # loud capacity check at every append: an overflow would otherwise
        # be a silent OOB numpy write (caps derive from config in
        # _plan_buckets; this guards drift — ADVICE r03)
        F, G16, R, Sp = self.caps

        def _check(n, cap, what):
            if n >= cap:
                raise ValueError(
                    f"PrefillStorePlan {what} capacity {cap} exceeded at "
                    f"span [{start},{end}) ps={ps}"
                )

        for pg in range(start // ps, (end - 1) // ps + 1):
            s0 = max(start, pg * ps)
            s1 = min(end, (pg + 1) * ps)
            dst = int(pages[pg]) * ps + s0 % ps
            src = src_off + (s0 - start)
            ln = s1 - s0
            while ln >= 128:
                _check(self.nf, F, "128-run")
                self.full_dst[self.nf] = dst
                self.full_src[self.nf] = src
                self.nf += 1
                dst += 128; src += 128; ln -= 128
            while ln >= 16:
                _check(self.n16, G16, "16-block")
                self.b16_dst[self.n16] = dst
                self.b16_src[self.n16] = src
                self.n16 += 1
                dst += 16; src += 16; ln -= 16
            while ln > 0:
                _check(self.nr, R, "row")
                self.row_dst[self.nr] = dst
                self.row_src[self.nr] = src
                self.nr += 1
                dst += 1; src += 1; ln -= 1
            if ps == 128:  # int8 scale rows: one 128-lane row per page
                _check(self.nsp, Sp, "scale-page")
                i = self.nsp
                self.spage[i] = int(pages[pg])
                lo, hi = s0 % ps, (s1 - 1) % ps + 1
                self.smask[i, lo:hi] = 1.0
                # lane j (within [lo, hi)) sources token row swin0 + j
                self.swin0[i] = src_off + (s0 - start) - lo
                self.nsp += 1

    def arrays(self) -> tuple:
        """(full_dst, full_src, b16_dst, b16_src, row_dst, row_src, spage,
        smask, swin0) — the order `prefill_step` zips into the plan dict."""
        return (self.full_dst, self.full_src, self.b16_dst, self.b16_src,
                self.row_dst, self.row_src, self.spage, self.smask,
                self.swin0)


def _prefill_kernel(
    *refs, ps: int, S128: int, N: int, quant: bool,
):
    """Block-DMA contiguous token runs + whole scale rows (prefill path).

    Plan entries address PLANE-LOCAL token slots; the kernel replays the
    same plan for the K plane (rows8[0:N]) and the V plane (rows8[N:2N]).
    Negative plan entries are padding (skipped)."""
    if quant:
        (layer_ref, full_dst, full_src, b16_dst, b16_src, row_dst, row_src,
         spage, rows8, snew, smask, pool_ref, plane_ref,
         out_ref, sout_ref, sem, ssem, sbuf) = refs
    else:
        (layer_ref, full_dst, full_src, b16_dst, b16_src, row_dst, row_src,
         rows8, pool_ref, out_ref, sem) = refs
        spage = snew = smask = plane_ref = sout_ref = ssem = sbuf = None

    layer = layer_ref[0]

    def run_class(dst_ref, src_ref, sz):
        # runs larger than the source, or than one page, cannot exist
        if sz > N or sz > ps:
            return lambda: None
        n = dst_ref.shape[0]

        def start(i, carry):
            @pl.when(dst_ref[i] >= 0)
            def _():
                d = dst_ref[i]
                for plane in range(2):
                    pltpu.make_async_copy(
                        rows8.at[pl.ds(plane * N + src_ref[i], sz)],
                        out_ref.at[layer, plane, d // ps,
                                   pl.ds(d % ps, sz)],
                        sem,
                    ).start()
            return carry

        def wait(i, carry):
            @pl.when(dst_ref[i] >= 0)
            def _():
                for _ in range(2):
                    pltpu.make_async_copy(
                        rows8.at[pl.ds(0, sz)],
                        out_ref.at[0, 0, 0, pl.ds(0, sz)],
                        sem,
                    ).wait()
            return carry

        jax.lax.fori_loop(0, n, start, 0)
        return lambda: jax.lax.fori_loop(0, n, wait, 0)

    w128 = run_class(full_dst, full_src, 128)
    w16 = run_class(b16_dst, b16_src, 16)
    w1 = run_class(row_dst, row_src, 1)

    if quant:
        ns = spage.shape[0]

        def sread(i, carry):
            @pl.when(spage[i] >= 0)
            def _():
                for plane in range(2):
                    pltpu.make_async_copy(
                        sout_ref.at[layer, plane, spage[i]],
                        sbuf.at[plane, i],
                        ssem,
                    ).start()
            return carry

        def swait(i, carry):
            @pl.when(spage[i] >= 0)
            def _():
                for _ in range(2):
                    pltpu.make_async_copy(
                        sout_ref.at[0, 0, 0], sbuf.at[0, 0], ssem
                    ).wait()
            return carry

        jax.lax.fori_loop(0, ns, sread, 0)
        jax.lax.fori_loop(0, ns, swait, 0)
        sbuf[...] = jnp.where(smask[...][None] > 0, snew[...], sbuf[...])

        def swrite(i, carry):
            @pl.when(spage[i] >= 0)
            def _():
                for plane in range(2):
                    pltpu.make_async_copy(
                        sbuf.at[plane, i],
                        sout_ref.at[layer, plane, spage[i]],
                        ssem,
                    ).start()
            return carry

        jax.lax.fori_loop(0, ns, swrite, 0)
        jax.lax.fori_loop(0, ns, swait, 0)

    w128()
    w16()
    w1()


@functools.partial(jax.jit, static_argnames=("interpret",))
def store_kv_prefill(
    pool: jax.Array,         # [L, 2, P, ps, nkv, hd]
    kv_rows: jax.Array,      # [2N, nkv, hd] rows to write (K then V halves)
    layer: jax.Array,        # [] or [1] int32 layer index
    plan: dict,              # host-built run decomposition (see below)
    scale: jax.Array | None = None,        # [L, 2, S128, 128] f32
    snew: jax.Array | None = None,         # [2, Sp, 128] new scale rows
    interpret: bool = False,
):
    """Prefill store: contiguous runs as block DMAs, scales as whole rows.

    plan keys (int32 numpy/device arrays, -1 entries are padding):
      full_dst/full_src [F]: 128-row runs (plane-local dst slot, src row)
      b16_dst/b16_src   [G]: 16-row runs
      row_dst/row_src   [R]: single rows
      spage             [Sp]: touched scale pages (quantized pools)
      smask             [Sp, 128] f32: lanes covered by new tokens
    Returns new pool (and new scale plane when given).
    """
    L, _, P, ps, nkv, hd = pool.shape
    N = kv_rows.shape[0] // 2
    quant = scale is not None
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    S128 = scale.shape[2] if quant else 0

    common_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # layer
        pl.BlockSpec(memory_space=pltpu.SMEM),  # full_dst
        pl.BlockSpec(memory_space=pltpu.SMEM),  # full_src
        pl.BlockSpec(memory_space=pltpu.SMEM),  # b16_dst
        pl.BlockSpec(memory_space=pltpu.SMEM),  # b16_src
        pl.BlockSpec(memory_space=pltpu.SMEM),  # row_dst
        pl.BlockSpec(memory_space=pltpu.SMEM),  # row_src
    ]
    common_ops = [
        layer, plan["full_dst"], plan["full_src"], plan["b16_dst"],
        plan["b16_src"], plan["row_dst"], plan["row_src"],
    ]
    if not quant:
        return pl.pallas_call(
            functools.partial(
                _prefill_kernel, ps=ps, S128=0, N=N, quant=False
            ),
            in_specs=common_specs + [
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # kv rows (HBM ok)
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # pool
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            input_output_aliases={8: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(*common_ops, kv_rows, pool)

    Sp = plan["spage"].shape[0]
    return pl.pallas_call(
        functools.partial(
            _prefill_kernel, ps=ps, S128=S128, N=N, quant=True
        ),
        in_specs=common_specs + [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # spage
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),      # kv rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # snew
            pl.BlockSpec(memory_space=pltpu.VMEM),  # smask
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),      # pool
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),      # scale plane
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(pool.shape, pool.dtype),
            jax.ShapeDtypeStruct(scale.shape, scale.dtype),
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((2, Sp, 128), jnp.float32),
        ],
        input_output_aliases={11: 0, 12: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*common_ops, plan["spage"], kv_rows, snew, plan["smask"],
      pool, scale)
