"""Bisect: why does the production decode kernel's DMA SKELETON run ~2.4x
slower than probe_dma2's identical schedule (0.67 vs 0.315 ms/pass, int4
sizes, v5e)?

Starts from the probe_dma2 fast skeleton and stacks production-kernel
features one at a time:
  base      : probe_dma2 skeleton (static FL, minimal scratch, ANY memspace)
  +vmemlim  : compiler_params vmem_limit_bytes=100MB
  +operands : q [B,nq,hd] bf16 VMEM in + o [B,nq,hd] bf16 VMEM out
  +scratch  : allocate (unused) qbd/acc/m/l/qs/sched/lens scratch
  +tracedfl : FL from an SMEM build loop (dynamic fori trip count)
  +sched    : packed SMEM schedule + tuple carry (production cursor)
  +hbm      : in_specs HBM memspace for the pool (vs ANY)
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nanovllmx_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=56)
args = ap.parse_args()

ps, nkv, hd = 128, 4, 128   # int4 packed sizes
B, GS, PAGES_PER = 256, 8, 7
P = 2048
D = nkv * hd
NSLOTS = 2
nq = 16
M = GS * nq

pool = jnp.zeros((1, 2, P, ps, nkv, hd), jnp.int8)
pt = np.zeros((B, 32), np.int32)
for i in range(B):
    pt[i, :PAGES_PER] = (np.arange(PAGES_PER) + i * PAGES_PER) % P
pt = jnp.asarray(pt)
q0 = jnp.zeros((B, nq, hd), jnp.bfloat16)
lens = jnp.full((B,), PAGES_PER * ps, jnp.int32)

ngroups = B // GS
nch = PAGES_PER
FL_STATIC = ngroups * nch


def make_call(feat):
    vmemlim = "vmemlim" in feat
    grid1 = "grid1" in feat
    idlearm = "idlearm" in feat
    operands = "operands" in feat
    xscratch = "scratch" in feat
    tracedfl = "tracedfl" in feat
    sched = "sched" in feat
    hbm = "hbm" in feat
    tracedlayer = "tracedlayer" in feat
    u8 = "u8" in feat
    load = "load" in feat      # synthetic MXU load per chunk (~2 us)
    vpu = "vpu" in feat        # synthetic VPU softmax-style chain per chunk
    unpA = "unpA" in feat      # int4 unpack -> dot from VALUES (production)
    unpB = "unpB" in feat      # int4 unpack -> store i8 scratch -> dot ref

    def kernel(*refs):
        it = iter(refs)
        pt_ref = next(it)
        lens_ref = next(it) if tracedfl else None
        layer_ref = next(it) if tracedlayer else None
        pool_ref = next(it)
        layer = layer_ref[0] if tracedlayer else 0
        q_ref = next(it) if operands else None
        out_ref = next(it)
        kbuf = next(it)
        vbuf = next(it)
        sem = next(it)
        if xscratch:
            qbd = next(it)
            acc = next(it)
            mm = next(it)
            ll = next(it)
            qs = next(it)
            lens_v = next(it)
        sched_ref = next(it) if sched else None
        if load:
            qx = next(it)
            accx = next(it)
        if unpA or unpB:
            kunp = next(it)

        def start_chunk(grp, chunk, slot):
            base = grp * GS
            for si in range(GS):
                page = pt_ref[base + si, chunk]
                pltpu.make_async_copy(
                    pool_ref.at[layer, 0, page],
                    kbuf.at[slot, pl.ds(0, ps), si],
                    sem.at[si, slot],
                ).start()
                pltpu.make_async_copy(
                    pool_ref.at[layer, 1, page],
                    vbuf.at[slot, si, pl.ds(0, ps)],
                    sem.at[si, slot],
                ).start()

        def wait_chunk(slot):
            for si in range(GS):
                pltpu.make_async_copy(
                    kbuf.at[slot, pl.ds(0, ps), si],
                    kbuf.at[slot, pl.ds(0, ps), si],
                    sem.at[si, slot],
                ).wait()
                pltpu.make_async_copy(
                    vbuf.at[slot, si, pl.ds(0, ps)],
                    vbuf.at[slot, si, pl.ds(0, ps)],
                    sem.at[si, slot],
                ).wait()

        if tracedfl:
            def build(gi, cursor):
                npg = functools.reduce(
                    jnp.maximum,
                    [pl.cdiv(lens_ref[gi * GS + si], ps) for si in range(GS)],
                )
                n = pl.cdiv(npg, 1)
                if sched:
                    def fill(c, _):
                        sched_ref[cursor + c] = (
                            (gi << 16) | (c << 1)
                            | (c + 1 == n).astype(jnp.int32)
                        )
                        return 0
                    jax.lax.fori_loop(0, n, fill, 0)
                if idlearm and operands:
                    @pl.when(n == 0)
                    def _():
                        out_ref[pl.ds(gi * GS, GS)] = jnp.zeros(
                            (GS, nq, hd), out_ref.dtype)
                return cursor + n
            FL = jax.lax.fori_loop(0, ngroups, build, jnp.int32(0))
        else:
            FL = FL_STATIC
            if sched:
                def build(gi, cursor):
                    def fill(c, _):
                        sched_ref[cursor + c] = (
                            (gi << 16) | (c << 1)
                            | (c + 1 == nch).astype(jnp.int32)
                        )
                        return 0
                    jax.lax.fori_loop(0, nch, fill, 0)
                    return cursor + nch
                jax.lax.fori_loop(0, ngroups, build, jnp.int32(0))

        if sched:
            def issue_e(entry, slot):
                start_chunk(entry >> 16, (entry >> 1) & 0x7FFF, slot)

            def body(i, carry):
                slot = jax.lax.rem(i, NSLOTS)
                pslot = jax.lax.rem(i + NSLOTS - 1, NSLOTS)

                @pl.when(i + NSLOTS - 1 < FL)
                def _():
                    issue_e(carry[NSLOTS - 1], pslot)
                wait_chunk(slot)
                if load:
                    # serial scores -> PV chain on the freshly staged K/V
                    # (~ the real kernel's int4 MXU cost per chunk)
                    if unpA or unpB:
                        kraw = kbuf[slot].reshape(ps, GS * D)
                        w = pltpu.bitcast(kraw, jnp.int32)
                        lo = pltpu.bitcast(w & 0x0F0F0F0F, jnp.int8)
                        hi = pltpu.bitcast(
                            jax.lax.shift_right_logical(
                                pltpu.bitcast(w, jnp.uint32),
                                jnp.uint32(4)).astype(jnp.int32)
                            & 0x0F0F0F0F, jnp.int8)
                        if unpB:
                            kunp[pl.ds(0, ps // 2)] = lo[pl.ds(0, ps // 2)] if False else lo[: ps // 2]
                            kunp[pl.ds(ps // 2, ps // 2)] = hi[: ps // 2]
                            kb = kunp[...]
                        else:
                            kb = jnp.concatenate(
                                [lo[: ps // 2], hi[: ps // 2]], axis=0)
                    else:
                        kb = kbuf[slot].reshape(ps, GS * D)
                    sc = jax.lax.dot_general(
                        qx[...], kb,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)  # [M, ps]
                    p_fake = jnp.concatenate(
                        [sc] * GS, axis=1).astype(jnp.int8)  # [M, GS*ps]
                    vb = vbuf[slot].reshape(GS * ps, D)
                    pv = jax.lax.dot_general(
                        p_fake, vb,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)  # [M, D]
                    if vpu:
                        # softmax-style VPU chain on the score tile:
                        # mask, max-reduce, exp2 poly, sum, scale-mult,
                        # round, int8 cast on the widened tile
                        scf = sc.astype(jnp.float32)
                        pos = jax.lax.broadcasted_iota(
                            jnp.int32, (M, ps), 1)
                        scf = jnp.where(pos < 800, scf * 1.7e-4, -1e30)
                        mx = jnp.max(scf, axis=1, keepdims=True)
                        x = jnp.maximum(scf - mx, -126.0)
                        xf = jnp.floor(x)
                        r = x - xf
                        pp = 1.0 + r * (0.693 + r * (0.24 + r * (
                            0.055 + r * 0.0097)))
                        ee = jax.lax.bitcast_convert_type(
                            (xf.astype(jnp.int32) + 127) << 23,
                            jnp.float32)
                        pex = ee * pp
                        ssum = jnp.sum(pex, axis=1, keepdims=True)
                        psc = jnp.maximum(
                            jnp.max(pex, axis=1, keepdims=True) / 127.0,
                            1e-30)
                        p8c = jnp.round(pex * (1.0 / psc))
                        p8w = jnp.broadcast_to(
                            p8c[:, None, :], (M, GS, ps)).reshape(
                            M, GS * ps).astype(jnp.int8)
                        pv2 = jax.lax.dot_general(
                            p8w, vb,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        accx[...] = accx[...] + pv + pv2 + (
                            ssum.astype(jnp.int32))
                    else:
                        accx[...] = accx[...] + pv
                nxt = sched_ref[
                    jnp.maximum(jnp.minimum(i + NSLOTS, FL - 1), 0)
                ]
                return (*carry[1:], nxt)

            first = [sched_ref[jnp.maximum(jnp.minimum(s, FL - 1), 0)]
                     for s in range(NSLOTS)]
            for s in range(NSLOTS - 1):
                @pl.when(s < FL)
                def _(s=s):
                    issue_e(first[s], jnp.int32(s))
            jax.lax.fori_loop(0, FL, body, tuple(first))
        else:
            def flat(i):
                return i // nch, jax.lax.rem(i, nch)

            def body(i, acc2):
                g2, c2 = flat(jnp.minimum(i + 1, FL - 1))

                @pl.when(i + 1 < FL)
                def _():
                    start_chunk(g2, c2, jax.lax.rem(i + 1, NSLOTS))
                wait_chunk(jax.lax.rem(i, NSLOTS))
                return acc2 + 1

            start_chunk(jnp.int32(0), jnp.int32(0), jnp.int32(0))
            jax.lax.fori_loop(0, FL, body, jnp.int32(0))

        if operands:
            out_ref[0] = q_ref[0]
        else:
            out_ref[0] = jnp.int32(1)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    ops = [pt]
    if tracedfl:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        ops.append(lens)
    if tracedlayer:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        ops.append(jnp.zeros((1,), jnp.int32))
    in_specs.append(pl.BlockSpec(
        memory_space=pltpu.MemorySpace.HBM) if hbm else pl.BlockSpec(
        memory_space=pl.ANY))
    ops.append(pool.astype(jnp.uint8) if u8 else pool)
    if operands:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        ops.append(q0)
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, nq, hd), jnp.bfloat16)
    else:
        out_specs = pl.BlockSpec(memory_space=pltpu.SMEM)
        out_shape = jax.ShapeDtypeStruct((1,), jnp.int32)

    scratch = [
        pltpu.VMEM((NSLOTS, ps, GS, nkv, hd), jnp.int8),
        pltpu.VMEM((NSLOTS, GS, ps, nkv, hd), jnp.int8),
        pltpu.SemaphoreType.DMA((GS, NSLOTS)),
    ]
    if xscratch:
        scratch += [
            pltpu.VMEM((2, M, GS * D), jnp.int8),      # qbd (int4 shape)
            pltpu.VMEM((M, 2 * D), jnp.float32),       # acc (logical D)
            pltpu.VMEM((M, 1), jnp.float32),
            pltpu.VMEM((M, 1), jnp.float32),
            pltpu.VMEM((M, 1), jnp.float32),
            pltpu.VMEM((M, 1), jnp.int32),
        ]
    if sched:
        scratch.append(pltpu.SMEM((ngroups * 32,), jnp.int32))
    if load:
        scratch.append(pltpu.VMEM((M, GS * D), jnp.int8))
        scratch.append(pltpu.VMEM((M, D), jnp.int32))
    if unpA or unpB:
        scratch.append(pltpu.VMEM((ps, GS * D), jnp.int8))  # klo | khi

    kw = {}
    if grid1:
        kw["grid"] = (1,)
    if vmemlim:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024, has_side_effects=True)
    else:
        kw["compiler_params"] = pltpu.CompilerParams(has_side_effects=True)

    return pl.pallas_call(
        kernel, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch, **kw), ops


def bench(feat):
    call, ops = make_call(feat)

    @functools.partial(jax.jit, static_argnums=(1,))
    def many(ops, iters):
        def body(carry, _):
            o = call(*ops)
            # consume the output so XLA cannot elide the call
            return carry + o.reshape(-1)[0].astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    try:
        float(many(tuple(ops), args.iters))
        float(many(tuple(ops), 2 * args.iters))
    except Exception as e:  # noqa: BLE001
        print(f"{'+'.join(sorted(feat)) or 'base':42s}: FAILED "
              f"{str(e)[:160]}", flush=True)
        return
    t0 = time.perf_counter()
    float(many(tuple(ops), args.iters))
    t1 = time.perf_counter()
    float(many(tuple(ops), 2 * args.iters))
    t2 = time.perf_counter()
    per = max(((t2 - t1) - (t1 - t0)) / args.iters, 1e-9)
    gb = B * PAGES_PER * 2 * ps * nkv * hd / 1e9
    print(f"{'+'.join(sorted(feat)) or 'base':42s}: {per*1e3:7.3f} ms/pass "
          f"({gb/per:6.1f} GB/s)", flush=True)


for feat in (
    frozenset(),
    frozenset({"tracedlayer"}),
    frozenset({"u8"}),
    frozenset({"hbm", "operands", "sched", "scratch", "tracedfl",
               "vmemlim", "tracedlayer"}),
    frozenset({"hbm", "operands", "sched", "scratch", "tracedfl",
               "vmemlim", "tracedlayer", "u8"}),
    frozenset({"grid1"}),
    frozenset({"hbm", "operands", "sched", "scratch", "tracedfl",
               "vmemlim", "tracedlayer", "u8", "load"}),
    frozenset({"hbm", "operands", "sched", "scratch", "tracedfl",
               "vmemlim", "tracedlayer", "u8", "load", "vpu"}),
    frozenset({"hbm", "operands", "sched", "scratch", "tracedfl",
               "vmemlim", "tracedlayer", "u8", "load", "vpu", "unpA"}),
    frozenset({"hbm", "operands", "sched", "scratch", "tracedfl",
               "vmemlim", "tracedlayer", "u8", "load", "vpu", "unpB"}),
    frozenset({"hbm", "operands", "sched", "scratch", "tracedfl",
               "vmemlim", "tracedlayer", "u8", "grid1"}),
    frozenset({"hbm", "operands", "sched", "scratch", "tracedfl",
               "vmemlim", "tracedlayer", "u8", "grid1", "idlearm"}),
    frozenset({"vmemlim"}),
    frozenset({"hbm"}),
    frozenset({"operands"}),
    frozenset({"scratch"}),
    frozenset({"tracedfl"}),
    frozenset({"sched"}),
    frozenset({"tracedfl", "sched"}),
    frozenset({"operands", "scratch"}),
    frozenset({"vmemlim", "hbm", "operands", "scratch", "tracedfl",
               "sched"}),
):
    bench(feat)
