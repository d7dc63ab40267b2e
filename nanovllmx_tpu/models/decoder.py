"""Generic pre-norm decoder-only transformer, functional JAX style.

One forward function covers the Llama-family architectures the registry
exposes (Qwen3 = qk-norm on, Llama = off, Qwen2 = qkv bias on, ...). The
reference builds the equivalent out of torch modules
(`nanovllmx/models/qwen3.py:138-268`); here the model is a pure function of a
parameter pytree so it jits, shards and quantizes without module machinery.

TPU-first structure:
* **Layer-stacked params + `lax.scan`** over layers — one traced layer body
  instead of `num_layers` unrolled copies, so each shape bucket compiles in
  seconds and the KV pool threads through the scan as per-layer xs/ys.
* Attention is injected as a callable `attend(q, kv_layer) -> out` so the same
  forward serves the XLA fallback and the Pallas kernels, and prefill/decode
  differ only in the injected closure (the reference injects metadata into
  module state via a context manager instead, `layers/attention.py:297-306`).

Parameter pytree layout (leading `L` = stacked layer axis):
  embed:      {"w": [V, H]}
  layers:     input_norm [L, H]; q/k/v {"w": [L, H, n*hd], "b"?};
              q_norm/k_norm [L, hd] (qk-norm models only); o {"w": [L, nq*hd, H]};
              post_norm [L, H]; gate/up {"w": [L, H, I]}; down {"w": [L, I, H]}
  final_norm: [H]
  lm_head:    {"w": [H, V]} — absent when tied to the embedding

Projections are stored UNFUSED (q, k, v and gate, up separate) so that tensor
parallelism is a plain dimension shard on every weight: fusing q|k|v would put
unequal head blocks on one axis and a last-dim shard would cross the block
boundaries, forcing GSPMD reshards around the per-head reshape (the reference
fuses because Megatron loaders shard per-block explicitly,
`layers/linear.py:333-408`). XLA fuses the shared-input GEMMs' elementwise
epilogues regardless; decode is HBM-bound so the byte traffic is identical.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from nanovllmx_tpu.ops.attention import write_kv
from nanovllmx_tpu.ops.layers import apply_rope, rms_norm, rope_cos_sin
from nanovllmx_tpu.ops.linear import dense


@dataclass(frozen=True)
class ModelSpec:
    """Architecture hyperparameters, extracted from an HF config.json."""

    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # HF rope_scaling (flattened so the frozen spec stays hashable for jit
    # static args): "none" | "linear" | "llama3" (ops/layers.rope_cos_sin)
    rope_scaling_type: str = "none"
    rope_scaling_factor: float = 1.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_orig_max_pos: int = 8192
    tie_embeddings: bool = False
    use_qk_norm: bool = False
    qkv_bias: bool = False
    # gated-MLP activation: "silu" (SwiGLU) or "gelu"/"gelu_pytorch_tanh"
    # (GeGLU, ref `layers/activation.py:24-37`)
    hidden_act: str = "silu"
    dtype: str = "bfloat16"

    @property
    def qkv_out(self) -> int:
        return (self.num_heads + 2 * self.num_kv_heads) * self.head_dim

    @property
    def scale(self) -> float:
        return self.head_dim ** -0.5


AttendFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]
# attend(q [N, nq, hd], kv_pool [L, 2, P, ps, nkv, hd], layer) -> [N, nq, hd]


def forward_hidden(
    params: dict,
    spec: ModelSpec,
    token_ids: jax.Array,   # [N] flat token ids
    positions: jax.Array,   # [N] absolute positions
    kv_pool: jax.Array,     # [L, 2, P, ps, nkv, hd]
    write_slots: jax.Array,  # [N] global KV slots for the new tokens
    attend: AttendFn,
    unique_pages: bool = False,  # decode: every write lands in its own page
    pallas_store: bool = False,  # TPU: DMA-scatter KV rows (ops/pallas)
    store_plan: dict | None = None,  # prefill: host-built run plan
    window: tuple | None = None,  # decode deferred store: (wk, wv, step_idx)
    unroll: int | None = None,   # layer-scan unroll (prefill: full unroll
                                 # stops XLA MSA round-tripping the 57 MB
                                 # scale plane through VMEM, ~-7% step time)
):
    """Run embedding + all decoder layers + final norm.

    Returns (hidden [N, H], new_kv_pool) — or, in window mode,
    (hidden, kv_pool, wk, wv). Logits are computed separately on the
    gathered last-token rows (`compute_logits`) so prefill never pays a
    full-chunk lm_head matmul (ref gathers last tokens the same way,
    `core/model_runner.py:221-227`).
    """
    x = embed_tokens(params, token_ids)
    out = run_layers(
        params["layers"], spec, x, positions, kv_pool, write_slots, attend,
        unique_pages=unique_pages, pallas_store=pallas_store,
        store_plan=store_plan, window=window, unroll=unroll,
    )
    if window is None:
        x, new_kv = out
        x = rms_norm(x, params["final_norm"], spec.rms_norm_eps)
        return x, new_kv
    x, new_kv, wk, wv = out
    x = rms_norm(x, params["final_norm"], spec.rms_norm_eps)
    return x, new_kv, wk, wv


def activation_fn(spec: ModelSpec):
    if spec.hidden_act == "silu":
        act = jax.nn.silu
    elif spec.hidden_act == "gelu":
        # HF "gelu" means EXACT erf GELU (the reference's GeluAndMul
        # defaults to tanh, diverging from HF semantics — ADVICE r02)
        act = functools.partial(jax.nn.gelu, approximate=False)
    elif spec.hidden_act in ("gelu_new", "gelu_pytorch_tanh"):
        # GeGLU, tanh approximation (ref `layers/activation.py:24-37`)
        act = functools.partial(jax.nn.gelu, approximate=True)
    else:
        raise ValueError(f"unsupported hidden_act {spec.hidden_act!r}")
    return act


def run_layers(
    layer_params: dict,     # layer-stacked pytree (possibly a LOCAL pp slice)
    spec: ModelSpec,
    x: jax.Array,           # [N, H] embedded hidden states
    positions: jax.Array,
    kv_pool: jax.Array,     # pool whose layer axis matches layer_params
    write_slots: jax.Array,
    attend: AttendFn,
    unique_pages: bool = False,
    pallas_store: bool = False,
    store_plan: dict | None = None,
    window: tuple | None = None,
    unroll: int | None = None,
):
    """Scan a stack of decoder layers over x (no embedding / final norm).

    Factored out of forward_hidden so the pipeline-parallel schedule
    (parallel/pipeline.py) can run a STAGE's local layer slice: each pp rank
    holds layer_params/kv_pool slices of num_layers/pp layers and calls this
    with local layer indices 0..L_local.

    `window=(wk, wv, step_idx)` selects the DEFERRED-STORE decode mode: the
    new K/V rows are NOT written to the pool; they land in the bf16 side
    buffers wk/wv [L, B, Kw, nkv, hd] at [layer, :, step_idx], and `attend`
    is called as attend(q, kv_pool, wk, wv, layer) (the Pallas kernel reads
    the window rows directly; the superstep bulk-stores them to the pool
    once per K steps — write_kv's per-step scatter + scale RMW were ~1.6 ms
    of a ~31 ms decode step at B=256 on v5e). Returns (x, kv_pool, wk, wv).
    """
    nq, nkv, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    N = x.shape[0]
    num_local = jax.tree.leaves(layer_params)[0].shape[0]
    cos, sin = rope_cos_sin(
        positions, hd, spec.rope_theta,
        scaling_type=spec.rope_scaling_type,
        scaling_factor=spec.rope_scaling_factor,
        low_freq_factor=spec.rope_low_freq_factor,
        high_freq_factor=spec.rope_high_freq_factor,
        orig_max_pos=spec.rope_orig_max_pos,
    )
    act = activation_fn(spec)

    # The FULL kv pool rides the scan as a carry, addressed by layer index:
    # a per-layer xs/ys slice would make XLA copy the ~0.5 GB slice every
    # layer (see ops/attention.py module docstring).
    def layer_fn(carry, layer_in):
        if window is None:
            x, kv_pool = carry
        else:
            x, kv_pool, wk, wv = carry
            step_idx = window[2]
            # optional 4th element: batch-row offset into the window
            # buffers (PP microbatches share full-B buffers; an invalid
            # round parks its write in the padding rows past max_bs)
            row0 = window[3] if len(window) > 3 else 0
        lp, layer_idx = layer_in
        h = rms_norm(x, lp["input_norm"], spec.rms_norm_eps)
        if "qkv" in lp:
            # fused projection (single-device; weights/loader
            # fuse_projections): ONE activation-quant chain + dot for
            # q|k|v instead of three
            qkv = dense(h, lp["qkv"])
            q = qkv[:, : nq * hd].reshape(N, nq, hd)
            k = qkv[:, nq * hd : (nq + nkv) * hd].reshape(N, nkv, hd)
            v = qkv[:, (nq + nkv) * hd :].reshape(N, nkv, hd)
        else:
            q = dense(h, lp["q"]).reshape(N, nq, hd)
            k = dense(h, lp["k"]).reshape(N, nkv, hd)
            v = dense(h, lp["v"]).reshape(N, nkv, hd)
        if spec.use_qk_norm:
            # per-head RMSNorm before rope (ref `models/qwen3.py:114-132`)
            q = rms_norm(q, lp["q_norm"], spec.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], spec.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if window is None:
            kv_pool = write_kv(kv_pool, k, v, write_slots, layer_idx,
                               unique_pages=unique_pages,
                               pallas_store=pallas_store,
                               store_plan=store_plan)
            attn = attend(q, kv_pool, layer_idx)
        else:
            wk = jax.lax.dynamic_update_slice(
                wk, k.astype(wk.dtype)[None, :, None],
                (layer_idx, row0, step_idx, 0, 0),
            )
            wv = jax.lax.dynamic_update_slice(
                wv, v.astype(wv.dtype)[None, :, None],
                (layer_idx, row0, step_idx, 0, 0),
            )
            attn = attend(q, kv_pool, wk, wv, layer_idx)
        x = x + dense(attn.reshape(N, nq * hd), lp["o"])
        h = rms_norm(x, lp["post_norm"], spec.rms_norm_eps)
        if "gate_up" in lp:
            gu = dense(h, lp["gate_up"])
            inter = gu.shape[-1] // 2
            gated = act(gu[:, :inter].astype(jnp.float32)).astype(
                h.dtype
            ) * gu[:, inter:]
        else:
            gated = act(dense(h, lp["gate"]).astype(jnp.float32)).astype(
                h.dtype
            ) * dense(h, lp["up"])
        x = x + dense(gated, lp["down"])
        if window is None:
            return (x, kv_pool), None
        return (x, kv_pool, wk, wv), None

    import os as _os
    _unroll = unroll if unroll is not None else int(
        _os.environ.get("NVX_SCAN_UNROLL", "1")
    )
    if window is None:
        (x, new_kv), _ = jax.lax.scan(
            layer_fn, (x, kv_pool),
            (layer_params, jnp.arange(num_local)), unroll=_unroll,
        )
        return x, new_kv
    (x, new_kv, wk, wv), _ = jax.lax.scan(
        layer_fn, (x, kv_pool, window[0], window[1]),
        (layer_params, jnp.arange(num_local)), unroll=_unroll,
    )
    return x, new_kv, wk, wv


def embed_tokens(params: dict, token_ids: jax.Array) -> jax.Array:
    """Embedding gather; int8 tables dequantize the taken rows with their
    per-row scales (quantize_embed_rows)."""
    e = params["embed"]
    x = jnp.take(e["w"], token_ids, axis=0)
    if e["w"].dtype == jnp.int8 and "scale" in e:
        s = jnp.take(e["scale"], token_ids, axis=0)
        x = (x.astype(jnp.float32) * s[:, None]).astype(
            params["final_norm"].dtype
        )
    return x


def compute_logits(params: dict, spec: ModelSpec, hidden: jax.Array) -> jax.Array:
    """hidden [B, H] -> logits [B, V]; tied embeddings reuse the embedding
    matrix transposed (ref `ParallelLMHead`, `vocab_parallel_embedding.py`).

    int8 tables run W8A8 (per-row activation quant + int8 MXU dot + the
    table's per-row scales as output-channel scales) — in decode this read
    of the largest single weight happens every generated token, so halving
    its bytes and doubling its MXU rate is a per-step win."""
    if "lm_head" in params and params["lm_head"] is not None:
        return dense(hidden, params["lm_head"]).astype(jnp.float32)
    e = params["embed"]
    w = e["w"]
    if w.dtype == jnp.int8 and "scale" in e:
        from nanovllmx_tpu.ops.linear import _quant_rows

        h8, hs = _quant_rows(hidden)
        acc = jax.lax.dot_general(
            h8, w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B, V]
        return acc.astype(jnp.float32) * hs * e["scale"][None, :]
    return jnp.dot(
        hidden, w.T.astype(hidden.dtype), preferred_element_type=jnp.float32
    )
