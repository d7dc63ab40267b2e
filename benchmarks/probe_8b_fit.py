"""Probe: Llama-3-8B-class fit + decode step on TPU (BASELINE config 3).

Three modes:
  (default)       memory-math table: weight/KV bytes per TP shard vs v5e HBM
  --chip          REAL single-chip run: int8 weights initialised directly on
                  device (~8.6 GiB), int8 KV pool, decode superstep timed
  --mesh N        AOT-lower (and with --mesh-compile, compile) the TP=N
                  decode superstep on an N-virtual-device CPU mesh — catches
                  shape/sharding walls without materialising weights

Recorded results (v5e single chip, 2026-08-20, --chip --batch 64
--seq-len 1024): weights 8.11 GiB int8 on device, pool 576 int8 pages
(1.2 GiB), decode superstep K=16 for 64 seqs: see stdout — recorded in
BASELINE.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nanovllmx_tpu.models.decoder import ModelSpec

GIB = 2**30
V5E_HBM_GIB = 16.0


def llama8b_spec() -> ModelSpec:
    return ModelSpec(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rms_norm_eps=1e-5, rope_theta=500000.0, tie_embeddings=False,
        use_qk_norm=False, dtype="bfloat16",
    )


def weight_bytes_int8(spec: ModelSpec) -> int:
    H, I, L = spec.hidden_size, spec.intermediate_size, spec.num_layers
    nq, nkv, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    per_layer = H * (nq + 2 * nkv) * hd + nq * hd * H + 3 * H * I  # int8
    scales = (nq + 2 * nkv) * hd + H + 2 * I + H  # f32 per layer
    norms = 2 * H * 2  # bf16
    emb = spec.vocab_size * H + spec.vocab_size * 4  # int8 + row scales
    lmh = 0 if spec.tie_embeddings else H * spec.vocab_size + spec.vocab_size * 4
    return L * (per_layer + scales * 4 + norms) + emb + lmh + H * 2


def kv_page_bytes(spec: ModelSpec, page_size: int) -> int:
    per_token = spec.num_kv_heads * spec.head_dim + 4  # int8 + f32 scale
    return spec.num_layers * 2 * page_size * per_token


def memory_table():
    spec = llama8b_spec()
    wb = weight_bytes_int8(spec)
    pb = kv_page_bytes(spec, 128)
    print(f"Llama-8B int8 weights: {wb / GIB:.2f} GiB "
          f"(page of 128 tokens: {pb / 2**20:.2f} MiB int8 KV)")
    for tp in (1, 4, 8):
        shard = wb / tp
        free = V5E_HBM_GIB - shard / GIB - 1.0  # ~1 GiB runtime/activations
        pages = int(free * GIB / (pb / tp)) if free > 0 else 0
        toks = pages * 128
        print(f"  TP={tp}: {shard / GIB:5.2f} GiB weights/chip, "
              f"~{max(free, 0):.1f} GiB for KV -> {pages} pages "
              f"({toks:,} tokens) per shard-group")


def init_int8_params(spec: ModelSpec, key):
    """int8 weights initialised ON DEVICE (no 32 GiB f32 host detour)."""
    L = spec.num_layers
    H, I = spec.hidden_size, spec.intermediate_size
    nq, nkv, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim

    def mk(key, shape):
        return jax.random.randint(key, shape, -127, 128, dtype=jnp.int8)

    keys = iter(jax.random.split(key, 16))

    def proj(shape, out_dim):
        return {
            "w": mk(next(keys), shape),
            "scale": jnp.full(shape[:-2] + (out_dim,), 2e-4, jnp.float32),
        }

    layers = {
        "input_norm": jnp.ones((L, H), jnp.bfloat16),
        "q": proj((L, H, nq * hd), nq * hd),
        "k": proj((L, H, nkv * hd), nkv * hd),
        "v": proj((L, H, nkv * hd), nkv * hd),
        "o": proj((L, nq * hd, H), H),
        "post_norm": jnp.ones((L, H), jnp.bfloat16),
        "gate": proj((L, H, I), I),
        "up": proj((L, H, I), I),
        "down": proj((L, I, H), H),
    }
    return {
        "embed": {
            "w": mk(next(keys), (spec.vocab_size, H)),
            "scale": jnp.full((spec.vocab_size,), 2e-4, jnp.float32),
        },
        "final_norm": jnp.ones((H,), jnp.bfloat16),
        "layers": layers,
        "lm_head": {
            "w": mk(next(keys), (H, spec.vocab_size)),
            "scale": jnp.full((spec.vocab_size,), 2e-4, jnp.float32),
        },
    }


def chip_run(args):
    from nanovllmx_tpu.config import EngineConfig
    from nanovllmx_tpu.engine.sequence import (
        ForwardBatch, ForwardMode, ScheduledSeq, Sequence,
    )
    from nanovllmx_tpu.runner.model_runner import ModelRunner
    from nanovllmx_tpu.sampling_params import SamplingParams

    spec = llama8b_spec()
    B = args.batch
    ps = 128
    pages_per = -(-args.seq_len // ps) + 1
    num_pages = max(B * pages_per + 8, 64)
    num_pages = -(-num_pages // 8) * 8
    cfg = EngineConfig(
        model="<8b-probe>", max_bs=B, context_len=4096, page_size=ps,
        prefill_chunk=1024, max_num_batched_tokens=1024,
        kv_cache_dtype="int8", quantization="int8",
        num_kv_pages=num_pages, decode_bs_buckets=(B,),
        prefill_token_buckets=(1024,),
    )
    t0 = time.perf_counter()
    params = jax.jit(lambda k: init_int8_params(spec, k))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    print(f"weights on device in {time.perf_counter()-t0:.1f}s "
          f"({weight_bytes_int8(spec)/GIB:.2f} GiB)", flush=True)
    runner = ModelRunner(cfg, params=params, spec=spec)
    stats = jax.local_devices()[0].memory_stats()
    if stats:  # axon tunnel devices may not expose memory_stats
        print(f"HBM in use: {stats['bytes_in_use']/GIB:.2f} / "
              f"{stats['bytes_limit']/GIB:.2f} GiB", flush=True)
    print(f"pool {num_pages} pages; backend {runner.attention_backend}",
          flush=True)

    seqs = []
    for i in range(B):
        s = Sequence(
            seq_id=f"s{i}",
            token_ids=list(np.random.randint(1, 1000, args.seq_len)),
            prompt_len=args.seq_len - 1,
            params=SamplingParams(ignore_eos=True),
        )
        s.page_ids = list(range(i * pages_per, (i + 1) * pages_per))
        s.cached_len = args.seq_len - 1
        seqs.append(s)
    K = cfg.decode_lookahead
    batch = ForwardBatch(ForwardMode.DECODE, [
        ScheduledSeq(seq=s, start=args.seq_len - 1,
                     end=args.seq_len - 1 + K)
        for s in seqs
    ])
    t0 = time.perf_counter()
    runner.execute_batch(batch)
    print(f"decode superstep #1 (compile+run): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        runner.execute_batch(batch)
        dt = time.perf_counter() - t0
        print(f"decode superstep: {dt:.3f}s -> {B*K/dt:.0f} tok/s "
              f"({dt/K*1e3:.1f} ms/token-step)", flush=True)


def mesh_lower(args):
    jax.config.update("jax_platforms", "cpu")
    from nanovllmx_tpu.parallel.mesh import (
        kv_pool_pspec, make_mesh, param_pspecs, shard_params,  # noqa: F401
    )
    from nanovllmx_tpu.models.decoder import compute_logits, forward_hidden
    from nanovllmx_tpu.ops import attention as attn_ops
    from nanovllmx_tpu.ops.sampler import sample
    from jax.sharding import NamedSharding

    tp = args.mesh
    spec = llama8b_spec()
    mesh = make_mesh(tp_size=tp)
    params_shapes = jax.eval_shape(
        lambda k: init_int8_params(spec, k), jax.random.PRNGKey(0)
    )
    pspecs = param_pspecs(spec, params_shapes, pp=False)
    param_sh = jax.tree.map(
        lambda s, p: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, p)
        ),
        params_shapes, pspecs,
        is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct),
    )
    B, ps, P, W = 64, 128, 576, 32
    kv_sh = {
        "kv": jax.ShapeDtypeStruct(
            (spec.num_layers, 2, P, ps, spec.num_kv_heads, spec.head_dim),
            jnp.int8, sharding=NamedSharding(mesh, kv_pool_pspec()),
        ),
        "scale": jax.ShapeDtypeStruct(
            (spec.num_layers, 2, -(-P * ps // 128 // 8) * 8, 128),
            jnp.float32,
            sharding=NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, None, None, None)
            ),
        ),
    }

    def decode_step(params, kv_pool, token_ids, positions, page_table,
                    seq_lens, write_slots, temps, top_ps, top_ks, min_ps,
                    key):
        def attend(q, kv_pool, layer):
            return attn_ops.paged_decode_attention_xla(
                q, kv_pool, page_table, seq_lens, spec.scale, layer=layer
            )

        hidden, kv_pool = forward_hidden(
            params, spec, token_ids, positions, kv_pool, write_slots, attend
        )
        logits = compute_logits(params, spec, hidden)
        return sample(logits, temps, top_ps, top_ks, min_ps, key), kv_pool

    i32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.int32)  # noqa: E731
    f32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)  # noqa: E731
    argshapes = (
        param_sh, kv_sh, i32(B), i32(B), i32(B, W), i32(B), i32(B),
        f32(B), f32(B), i32(B), f32(B),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    t0 = time.perf_counter()
    lowered = jax.jit(decode_step, donate_argnums=(1,)).lower(*argshapes)
    print(f"TP={tp} 8B decode step LOWERED in "
          f"{time.perf_counter()-t0:.1f}s (mesh {mesh.shape})", flush=True)
    if args.mesh_compile:
        t0 = time.perf_counter()
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        print(f"compiled in {time.perf_counter()-t0:.1f}s; "
              f"argument {mem.argument_size_in_bytes/GIB:.2f} GiB, "
              f"temp {mem.temp_size_in_bytes/GIB:.2f} GiB", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chip", action="store_true")
    ap.add_argument("--mesh", type=int, default=0)
    ap.add_argument("--mesh-compile", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=1024)
    args = ap.parse_args()
    memory_table()
    if args.chip:
        chip_run(args)
    elif args.mesh:
        mesh_lower(args)


if __name__ == "__main__":
    main()
