"""On-chip kernel compile gate.

Round 3 shipped a decode-kernel variant that passed every interpret-mode
test and failed Mosaic compilation on the real chip (BENCH_r03 rc=1:
`tpu.reshape (vector<128x8x16xf32>) -> vector<128x128xf32>`). Interpret
mode checks semantics; it never runs infer-vector-layout or any other
Mosaic pass. This gate AOT-compiles EVERY Pallas kernel variant at
production shapes on the actual TPU backend, so a lowering regression is
caught before a commit instead of by the driver's bench.

Run before any commit that touches `ops/`:

    timeout 1500 python benchmarks/compile_gate.py            # kernel matrix
    timeout 3000 python benchmarks/compile_gate.py --runner   # + full warmup

`--runner` additionally builds a ModelRunner on the random Qwen3-0.6B spec
at the bench config and runs `warmup()` (compiles + executes every jitted
callable the serving path can reach, exactly like the bench does). The
persistent compilation cache makes repeat runs cheap.

Exit code 0 = all variants compiled; nonzero = at least one failed (each
failure is printed with its exception).
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def S(shape, dtype):
    import jax

    return jax.ShapeDtypeStruct(shape, dtype)


def kernel_matrix():
    """(name, thunk) pairs; each thunk AOT-lowers+compiles one variant at
    Qwen3-0.6B production shapes (B=256, nq=16, nkv=8, hd=128, ps=128)."""
    import jax.numpy as jnp

    from nanovllmx_tpu.ops.attention import bulk_store_window
    from nanovllmx_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_pallas,
    )
    from nanovllmx_tpu.ops.pallas.int4_matmul import int4_matmul_pallas
    from nanovllmx_tpu.ops.pallas.kv_write import (
        scatter_kv_rows, store_kv_prefill,
    )
    from nanovllmx_tpu.ops.pallas.prefill_attention import (
        BLOCK_Q, ragged_prefill_attention_pallas,
    )
    from nanovllmx_tpu.ops.sampler import sample

    L, P, ps, nkv, hd, nq = 28, 64, 128, 8, 128, 16
    B, W, Kw = 256, 32, 16
    scale = hd ** -0.5
    s128 = -(-P * ps // 128)
    s128 = -(-s128 // 8) * 8

    pool_bf16 = S((L, 2, P, ps, nkv, hd), jnp.bfloat16)
    pool_f8 = S((L, 2, P, ps, nkv, hd), jnp.float8_e4m3fn)
    pool_int8 = {
        "kv": S((L, 2, P, ps, nkv, hd), jnp.int8),
        "scale": S((L, 2, s128, 128), jnp.float32),
    }
    pool_int4 = {
        "kv": S((L, 2, P, ps, nkv // 2, hd), jnp.int8),
        "p4": S((0,), jnp.int8),
        "scale": S((L, 2, s128, 128), jnp.float32),
    }
    q_d = S((B, nq, hd), jnp.bfloat16)
    pt = S((B, W), jnp.int32)
    lens = S((B,), jnp.int32)
    layer = S((), jnp.int32)
    win = (
        S((L, B, Kw, nkv, hd), jnp.bfloat16),
        S((L, B, Kw, nkv, hd), jnp.bfloat16),
        S((B,), jnp.int32),
    )

    def dec(pool, window=None):
        return lambda: paged_decode_attention_pallas.lower(
            q_d, pool, pt, lens, scale, layer, window=window
        ).compile()

    # prefill: flat-packed NT tokens over Sx sequences
    NT = 2048 + BLOCK_Q
    Sx = 16
    q_p = S((NT, nq, hd), jnp.bfloat16)
    pt_p = S((Sx, W), jnp.int32)
    indptr = S((Sx + 1,), jnp.int32)
    svec = S((Sx,), jnp.int32)

    def pre(pool):
        return lambda: ragged_prefill_attention_pallas.lower(
            q_p, pool, pt_p, indptr, svec, svec, scale, layer
        ).compile()

    # kv stores (native pool/scale shapes)
    N2 = 2 * B
    rows8 = S((N2, nkv, hd), jnp.int8)      # prefill-plan layout (K|V halves)
    rows8_il = S((N2 // 2, 2, nkv, hd), jnp.int8)   # decode interleaved
    rowsb = S((N2 // 2, 2, nkv, hd), jnp.bfloat16)
    slots = S((B,), jnp.int32)
    scale4 = S((L, 2, s128, 128), jnp.float32)
    sval = S((N2,), jnp.float32)

    # prefill store plan (shapes as the runner builds them at defaults)
    F, G16, R, Sp = NT // 128 + 2 * Sx, NT // 16 + 2 * Sx, 32 * Sx, \
        NT // 128 + 2 * Sx
    plan = {
        "full_dst": S((F,), jnp.int32), "full_src": S((F,), jnp.int32),
        "b16_dst": S((G16,), jnp.int32), "b16_src": S((G16,), jnp.int32),
        "row_dst": S((R,), jnp.int32), "row_src": S((R,), jnp.int32),
        "spage": S((Sp,), jnp.int32), "smask": S((Sp, 128), jnp.float32),
        "swin0": S((Sp,), jnp.int32),
    }
    snew = S((2, Sp, 128), jnp.float32)

    # decode window bulk store (int8 pool): same wrapper the superstep uses
    import jax

    Fd = max(1, B * (Kw // 128))
    Gd = (Kw // 16 + Kw // ps + 2) * B
    Rd = (Kw + 2) * B
    Spd = B * (Kw // 128 + 2)
    dplan = {
        "full_dst": S((Fd,), jnp.int32), "full_src": S((Fd,), jnp.int32),
        "b16_dst": S((Gd,), jnp.int32), "b16_src": S((Gd,), jnp.int32),
        "row_dst": S((Rd,), jnp.int32), "row_src": S((Rd,), jnp.int32),
        "spage": S((Spd,), jnp.int32), "smask": S((Spd, 128), jnp.float32),
        "swin0": S((Spd,), jnp.int32),
    }
    bulk = jax.jit(bulk_store_window)

    # int4 fused dequant-matmul (lm_head-ish shape)
    K4, N4, G4 = 1024, 3072, 128
    int4_args = (
        S((B, K4), jnp.int8), S((B, 1), jnp.float32),
        S((K4 // 2, N4), jnp.uint8), S((K4 // G4, N4), jnp.float32),
    )

    key = jax.random.key(0, impl="rbg")
    samp = jax.jit(sample)

    return [
        ("decode_bf16", dec(pool_bf16)),
        ("decode_int8", dec(pool_int8)),
        ("decode_int4", dec(pool_int4)),
        ("decode_f8", dec(pool_f8)),
        ("decode_bf16_window", dec(pool_bf16, win)),
        ("decode_int8_window", dec(pool_int8, win)),
        ("prefill_bf16", pre(pool_bf16)),
        ("prefill_int8", pre(pool_int8)),
        ("prefill_int4", pre(pool_int4)),
        ("scatter_rows", lambda: scatter_kv_rows.lower(
            pool_bf16, rowsb, layer, slots).compile()),
        ("scatter_rows_scales", lambda: scatter_kv_rows.lower(
            pool_int8["kv"], rows8_il, layer, slots, scale4,
            sval).compile()),
        ("store_prefill_bf16", lambda: store_kv_prefill.lower(
            pool_bf16, S((NT * 2, nkv, hd), jnp.bfloat16), layer,
            {k: plan[k] for k in plan}).compile()),
        ("store_prefill_int8", lambda: store_kv_prefill.lower(
            pool_int8["kv"], S((NT * 2, nkv, hd), jnp.int8), layer, plan,
            scale=scale4, snew=snew).compile()),
        ("bulk_store_window_int8", lambda: bulk.lower(
            {"kv": S((L, 2, P, ps, nkv, hd), jnp.int8),
             "scale": S((L, 2, s128, 128), jnp.float32)},
            win[0], win[1], dplan).compile()),
        ("int4_matmul", lambda: int4_matmul_pallas.lower(
            *int4_args, group_size=G4).compile()),
        ("sampler", lambda: samp.lower(
            S((B, 151936), jnp.float32), S((B,), jnp.float32),
            S((B,), jnp.float32), S((B,), jnp.int32), S((B,), jnp.float32),
            key).compile()),
        ("fused_lmhead_sample", lambda: __import__(
            "nanovllmx_tpu.ops.pallas.lmhead_sample",
            fromlist=["fused_lmhead_sample"],
        ).fused_lmhead_sample.lower(
            S((B, 1024), jnp.bfloat16), S((151936, 1024), jnp.int8),
            S((151936,), jnp.float32), S((B,), jnp.float32),
            S((4,), jnp.int32)).compile()),
    ]


def run_runner_warmup():
    """Full ModelRunner warmup at the bench config (small KV pool)."""
    import jax.numpy as jnp

    from bench import qwen3_06b_spec
    from nanovllmx_tpu.config import EngineConfig
    from nanovllmx_tpu.runner.model_runner import ModelRunner
    from nanovllmx_tpu.weights.loader import init_random_params

    spec = qwen3_06b_spec()
    cfg = EngineConfig(
        model="<gate-qwen3-0.6b>", max_bs=256, context_len=4096,
        page_size=128, prefill_chunk=2048, max_num_batched_tokens=2048,
        num_kv_pages=64, kv_cache_dtype="int8", quantization="int8",
    )
    params = init_random_params(
        spec, dtype=jnp.bfloat16, quantization="int8",
        quant_group_size=cfg.quant_group_size,
    )
    runner = ModelRunner(cfg, params=params, spec=spec)
    runner.warmup()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runner", action="store_true",
                    help="also run the full ModelRunner warmup")
    ap.add_argument("--only", default="",
                    help="comma-separated variant-name filter")
    args = ap.parse_args()

    import jax

    from nanovllmx_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    platform = jax.devices()[0].platform
    print(f"compile gate on platform={platform}", flush=True)
    if platform == "cpu":
        print("WARNING: running on CPU — this does NOT exercise Mosaic "
              "TPU lowering; the gate only counts on the real chip.")

    only = set(args.only.split(",")) if args.only else None
    failures = []
    for name, thunk in kernel_matrix():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            thunk()
            print(f"  PASS {name:26s} {time.perf_counter() - t0:6.1f}s",
                  flush=True)
        except Exception:
            failures.append(name)
            print(f"  FAIL {name}", flush=True)
            traceback.print_exc()

    if args.runner and not failures:
        t0 = time.perf_counter()
        try:
            run_runner_warmup()
            print(f"  PASS runner_warmup {time.perf_counter() - t0:6.1f}s",
                  flush=True)
        except Exception:
            failures.append("runner_warmup")
            traceback.print_exc()

    if failures:
        print(f"COMPILE GATE FAILED: {failures}")
        return 1
    print("compile gate: all variants compiled")
    return 0


if __name__ == "__main__":
    sys.exit(main())
