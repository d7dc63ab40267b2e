"""Microbench: int4 nibble-unpack strategies for the decode kernel.

The r4 int4 decode path unpacks head-pair-packed uint8 KV bytes via
`astype(int32) >> 4 & 15 - 8` + int8 casts — four full-buffer relayouts per
chunk that cost more than the halved DMA saves (0.91 vs 0.78 ms/pass,
BASELINE.md r4 finding 5). This probe times the unpack+scores-dot chain for
candidate strategies at the production chunk shape, standalone.

Findings (v5e, 2026-08-21):
  * 8-bit shifts (arith.shli on i8 vectors) DO NOT legalize in Mosaic —
    "tc_shift"/"u8_bitwise" variants are impossible.
  * "i32_lane": bitcast the packed bytes to i32 lanes, mask/shift at 32 bit
    (byte-uniform masks are packing-agnostic), bitcast back to i8 — the
    offset-8 fold makes the nibbles usable unsigned with a [M,1] rowsum
    correction.
  * "native_i4": pltpu.bitcast to jnp.int4 and feed the MXU directly.

Run ON THE CHIP: python benchmarks/probe_int4_unpack.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# production decode chunk shape: GS=8 seqs, CT=128 tokens, nkv=8, hd=128
GS, CT, NKV, HD = 8, 128, 8, 128
D = NKV * HD          # 1024 logical
D2 = D // 2           # packed width
NQ = 16
M = GS * NQ           # 128


def unpack_i32_lane(kb):
    """[CT, X] uint8 packed bytes -> (lo, hi) int8 UNSIGNED nibbles (0..15)
    via 32-bit lane ops only (no 8-bit shifts, which Mosaic rejects)."""
    w = pltpu.bitcast(kb, jnp.int32)  # [CT/4, X] (sublane packing)
    lo = pltpu.bitcast(w & 0x0F0F0F0F, jnp.int8)
    hi = pltpu.bitcast(
        jax.lax.shift_right_logical(
            pltpu.bitcast(w, jnp.uint32), jnp.uint32(4)
        ).astype(jnp.int32) & 0x0F0F0F0F,
        jnp.int8,
    )
    return lo, hi


def make_kernel(variant, R):
    def kernel(kb_ref, q0_ref, q1_ref, out_ref, acc):
        acc[...] = jnp.zeros_like(acc)

        def body(i, _):
            if variant == "int8ref":
                kbig = kb_ref[...]
                sc = jax.lax.dot_general(
                    q0_ref[...], kbig,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            elif variant == "cur_i32":
                kb4 = kb_ref[...].astype(jnp.int32)
                lo = ((kb4 & 15) - 8).astype(jnp.int8)
                hi = (((kb4 >> 4) & 15) - 8).astype(jnp.int8)
                sc = jax.lax.dot_general(
                    q0_ref[...], lo,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ) + jax.lax.dot_general(
                    q1_ref[...], hi,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            elif variant == "i32_lane":
                lo, hi = unpack_i32_lane(kb_ref[...])
                sc = jax.lax.dot_general(
                    q0_ref[...], lo,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ) + jax.lax.dot_general(
                    q1_ref[...], hi,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                corr = 8 * (
                    jnp.sum(q0_ref[...].astype(jnp.int32), axis=1,
                            keepdims=True)
                    + jnp.sum(q1_ref[...].astype(jnp.int32), axis=1,
                              keepdims=True)
                )
                sc = sc - corr
            elif variant == "native_i4":
                # token-pair packing: kb is [CT/2, GS*D] uint8; int4 bitcast
                # doubles the SUBLANE dim -> [CT, GS*D] int4, one MXU dot,
                # zero unpack work
                k4 = pltpu.bitcast(kb_ref[...], jnp.int4)
                sc = jax.lax.dot_general(
                    q0_ref[...], k4,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            else:
                raise ValueError(variant)
            acc[...] = acc[...] + sc
            return 0

        jax.lax.fori_loop(0, R, body, 0)
        out_ref[...] = acc[...]

    return kernel


def bench(variant):
    rng = np.random.default_rng(0)
    wide = variant in ("int8ref", "native_i4")
    if variant == "int8ref":
        kb = jnp.asarray(rng.integers(-127, 128, (CT, GS * D)), jnp.int8)
    elif variant == "native_i4":
        kb = jnp.asarray(rng.integers(0, 256, (CT // 2, GS * D)), jnp.uint8)
    else:
        kb = jnp.asarray(rng.integers(0, 256, (CT, GS * D2)), jnp.uint8)
    qw = GS * (D if wide else D2)
    q0 = jnp.asarray(rng.integers(-127, 128, (M, qw)), jnp.int8)
    q1 = jnp.asarray(rng.integers(-127, 128, (M, GS * D2)), jnp.int8)

    def run(kb, q0, q1, R):
        return pl.pallas_call(
            make_kernel(variant, R),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, CT), jnp.int32),
            scratch_shapes=[pltpu.VMEM((M, CT), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(kb, q0, q1)

    jrun = jax.jit(run, static_argnums=3)
    R = 16384
    try:
        np.asarray(jrun(kb, q0, q1, R))
        np.asarray(jrun(kb, q0, q1, 4 * R))
    except Exception as e:  # noqa: BLE001
        print(f"{variant:10s}: FAILED {type(e).__name__}: {str(e)[:600]}")
        return

    # difference R vs 4R to cancel the ~25 ms tunnel RTT
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jrun(kb, q0, q1, R))
        t1 = time.perf_counter()
        np.asarray(jrun(kb, q0, q1, 4 * R))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (3 * R))
    print(f"{variant:10s}: {best*1e6:8.2f} us/chunk-iter")


def check_i32_lane_semantics():
    """Interpret-free semantic check of the i32-lane unpack on the CHIP:
    run a tiny kernel that just unpacks and writes lo/hi out."""
    rng = np.random.default_rng(1)
    vals = rng.integers(-8, 8, (8, 512, 2))
    packed = ((vals[..., 0] + 8) | ((vals[..., 1] + 8) << 4)).astype(np.uint8)

    def kernel(kb_ref, lo_ref, hi_ref):
        lo, hi = unpack_i32_lane(kb_ref[...])
        lo_ref[...] = lo
        hi_ref[...] = hi

    lo, hi = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct(packed.shape, jnp.int8)] * 2,
    )(jnp.asarray(packed))
    assert (np.asarray(lo) == vals[..., 0] + 8).all(), "lo mismatch"
    assert (np.asarray(hi) == vals[..., 1] + 8).all(), "hi mismatch"
    print("i32_lane unpack semantics: OK (unsigned nibbles, offset-8)")




def check_native_i4_order():
    """Which token does each nibble land on after the int4 bitcast?
    Pack rows pairwise with known values and dot against one-hot q."""
    X = 256
    CT2 = 8  # packed rows -> 16 int4 rows
    rng = np.random.default_rng(2)
    lo = rng.integers(-8, 8, (CT2, X))
    hi = rng.integers(-8, 8, (CT2, X))
    packed = ((lo & 15) | ((hi & 15) << 4)).astype(np.uint8)

    def kernel(kb_ref, q_ref, out_ref):
        k4 = pltpu.bitcast(kb_ref[...], jnp.int4)
        out_ref[...] = jax.lax.dot_general(
            q_ref[...], k4,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    q = np.zeros((8, X), np.int8)
    q[:, :8] = np.eye(8, dtype=np.int8)  # row j selects feature j
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 2 * CT2), jnp.int32),
    )(jnp.asarray(packed), jnp.asarray(q))
    out = np.asarray(out)  # [8, 16]: row j = feature j over 16 i4 rows
    got_even = out[:, 0::2]   # i4 rows 0,2,..  (packed row r -> ?)
    got_odd = out[:, 1::2]
    lo_t = lo[:, :8].T  # [feature, packed_row]
    hi_t = hi[:, :8].T
    if (got_even == lo_t).all() and (got_odd == hi_t).all():
        print("native_i4 order: row 2r = LOW nibble, row 2r+1 = HIGH nibble")
    elif (got_even == hi_t).all() and (got_odd == lo_t).all():
        print("native_i4 order: row 2r = HIGH nibble, row 2r+1 = LOW nibble")
    else:
        print("native_i4 order: UNRECOGNIZED\n", out[:2], "\nlo:", lo_t[:2],
              "\nhi:", hi_t[:2])


if __name__ == "__main__":
    check_i32_lane_semantics()
    try:
        check_native_i4_order()
    except Exception as e:  # noqa: BLE001
        print("native_i4 order check FAILED:", str(e)[:200])
    for v in ("int8ref", "cur_i32", "i32_lane", "native_i4"):
        bench(v)
