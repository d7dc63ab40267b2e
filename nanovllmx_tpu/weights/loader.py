"""Safetensors -> JAX parameter pytree.

Counterpart of the reference loader (`nanovllmx/model_loader.py`): glob
`*.safetensors`, iterate tensors, map names. Instead of per-parameter
`weight_loader` attributes doing TP shard copies (`layers/linear.py:157-165`),
weights are assembled host-side into the layer-stacked layout of
`models/decoder.py` (q/k/v fused into qkv, gate/up fused — same stacked-param
mapping idea as `models/qwen3.py:310-348`), optionally quantized, then
device_put with NamedShardings by the runner.
"""

from __future__ import annotations

import glob
import os

import jax.numpy as jnp
import numpy as np
from safetensors import safe_open

from nanovllmx_tpu.models.decoder import ModelSpec
from nanovllmx_tpu.ops.linear import quantize_int4, quantize_int8

# matmul weights that participate in weight-only quantization
_QUANT_KEYS = ("q", "k", "v", "o", "gate", "up", "down")


def fuse_projections(params: dict) -> dict:
    """Fuse q|k|v -> "qkv" and gate|up -> "gate_up" along the OUT dim
    (single-device path; the mesh path keeps them separate so column-
    parallel sharding stays per-projection).

    W8A8 quantizes activations per ROW, once per dense call: separate
    q/k/v/gate/up projections paid five amax/round/s8-write chains over the
    [NT, H] activations per layer — measured as the dominant share of the
    11.6 ms/step non-matmul 'other' tail in the r5 prefill xprof. Fusing is
    numerically EXACT for every weight format (per-channel int8 scales,
    int4 per-group scales, and biases all concatenate along out).

    MUTATES params["layers"] in place and blocks between groups so the
    transient device memory is bounded by ONE group's originals + fused
    copy — an 8B model's gate|up alone is ~3.8 GiB, and holding every
    original alive behind a copied dict while all fused leaves dispatch
    asynchronously OOMed the 15.75 GiB chip."""
    import jax

    layers = params["layers"]

    def cat(names: tuple, out_name: str) -> None:
        parts = [layers.pop(n) for n in names]
        fused = {"w": jnp.concatenate([p["w"] for p in parts], axis=-1)}
        if all("scale" in p for p in parts):
            fused["scale"] = jnp.concatenate(
                [p["scale"] for p in parts], axis=-1
            )
        if all(p.get("b") is not None for p in parts):
            fused["b"] = jnp.concatenate([p["b"] for p in parts], axis=-1)
        del parts  # drop the last reference to the originals
        jax.block_until_ready(fused["w"])
        layers[out_name] = fused

    if all(k in layers for k in ("q", "k", "v")):
        cat(("q", "k", "v"), "qkv")
    if "gate" in layers and "up" in layers:
        cat(("gate", "up"), "gate_up")
    return params


def iter_safetensors(model_dir: str):
    """Yield (name, np.ndarray) over all *.safetensors in the directory
    (ref `safetensors_weights_iterator`, `model_loader.py:22-40`)."""
    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {model_dir}")
    for path in files:
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def _np_dtype(spec_dtype: str):
    return {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
        "float32": jnp.float32,
    }.get(spec_dtype, jnp.bfloat16)


def load_params(
    model_dir: str,
    spec: ModelSpec,
    dtype=None,
    quantization: str | None = None,
    quant_group_size: int = 128,
) -> dict:
    """Load, fuse and stack weights into the decoder pytree (host numpy ->
    jnp). `quantization`: None | 'int8' | 'int4' (weight-only, matmul weights
    only; embeddings/norms stay in `dtype`)."""
    dtype = dtype or _np_dtype(spec.dtype)
    L = spec.num_layers
    nq, nkv, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    H, I = spec.hidden_size, spec.intermediate_size

    def zeros(*shape):
        return np.zeros(shape, dtype=np.float32)

    layers = {
        "input_norm": zeros(L, H),
        "q": {"w": zeros(L, H, nq * hd)},
        "k": {"w": zeros(L, H, nkv * hd)},
        "v": {"w": zeros(L, H, nkv * hd)},
        "o": {"w": zeros(L, nq * hd, H)},
        "post_norm": zeros(L, H),
        "gate": {"w": zeros(L, H, I)},
        "up": {"w": zeros(L, H, I)},
        "down": {"w": zeros(L, I, H)},
    }
    if spec.qkv_bias:
        layers["q"]["b"] = zeros(L, nq * hd)
        layers["k"]["b"] = zeros(L, nkv * hd)
        layers["v"]["b"] = zeros(L, nkv * hd)
    if spec.use_qk_norm:
        layers["q_norm"] = zeros(L, hd)
        layers["k_norm"] = zeros(L, hd)

    params: dict = {
        "embed": {"w": zeros(spec.vocab_size, H)},
        "final_norm": zeros(H),
        "layers": layers,
    }
    if not spec.tie_embeddings:
        params["lm_head"] = {"w": zeros(H, spec.vocab_size)}

    for name, t in iter_safetensors(model_dir):
        t = np.asarray(t).astype(np.float32)  # ml_dtypes handles bf16 -> f32
        if name == "model.embed_tokens.weight":
            params["embed"]["w"][:] = t
        elif name == "model.norm.weight":
            params["final_norm"][:] = t
        elif name == "lm_head.weight":
            if not spec.tie_embeddings:
                params["lm_head"]["w"][:] = t.T
        elif name.startswith("model.layers."):
            parts = name.split(".")
            i = int(parts[2])
            sub = ".".join(parts[3:])
            if sub == "input_layernorm.weight":
                layers["input_norm"][i] = t
            elif sub == "post_attention_layernorm.weight":
                layers["post_norm"][i] = t
            elif sub == "self_attn.q_proj.weight":
                layers["q"]["w"][i] = t.T
            elif sub == "self_attn.k_proj.weight":
                layers["k"]["w"][i] = t.T
            elif sub == "self_attn.v_proj.weight":
                layers["v"]["w"][i] = t.T
            elif sub == "self_attn.q_proj.bias":
                layers["q"]["b"][i] = t
            elif sub == "self_attn.k_proj.bias":
                layers["k"]["b"][i] = t
            elif sub == "self_attn.v_proj.bias":
                layers["v"]["b"][i] = t
            elif sub == "self_attn.q_norm.weight":
                layers["q_norm"][i] = t
            elif sub == "self_attn.k_norm.weight":
                layers["k_norm"][i] = t
            elif sub == "self_attn.o_proj.weight":
                layers["o"]["w"][i] = t.T
            elif sub == "mlp.gate_proj.weight":
                layers["gate"]["w"][i] = t.T
            elif sub == "mlp.up_proj.weight":
                layers["up"]["w"][i] = t.T
            elif sub == "mlp.down_proj.weight":
                layers["down"]["w"][i] = t.T
            # rotary inv_freq buffers etc. are ignored

    return _finalize(params, dtype, quantization, quant_group_size)


def init_random_params(
    spec: ModelSpec,
    dtype=jnp.bfloat16,
    quantization: str | None = None,
    quant_group_size: int = 128,
    seed: int = 0,
) -> dict:
    """Random-initialised parameter pytree with the exact production layout.

    Used by benchmarks and the graft entry when no checkpoint is on disk
    (zero-egress environment): throughput does not depend on weight values.
    """
    import jax

    L = spec.num_layers
    nq, nkv, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    H, I = spec.hidden_size, spec.intermediate_size
    key = jax.random.PRNGKey(seed)

    def rnd(*shape, scale=0.02):
        nonlocal key
        key, sub = jax.random.split(key)
        return (jax.random.normal(sub, shape, jnp.float32) * scale)

    def proj(*shape, scale=0.02):
        """A layer-stacked projection leaf. Large quantized leaves are
        generated AND quantized per layer (blocking between layers): the
        naive whole-pytree f32 build is ~30 GB of in-flight device arrays
        for an 8B model — jax dispatches it all asynchronously and the
        RESOURCE_EXHAUSTED only surfaces at the next sync (measured, r4)."""
        nonlocal key
        import numpy as _np

        nbytes = 4 * int(_np.prod(shape))
        if quantization in ("int8", "int4") and len(shape) == 3 \
                and nbytes > (1 << 30):
            key, sub = jax.random.split(key)
            subs = jax.random.split(sub, shape[0])
            qfn = (
                quantize_int8 if quantization == "int8"
                else lambda w: quantize_int4(w, quant_group_size)
            )
            gen = jax.jit(lambda k: qfn(
                jax.random.normal(k, shape[1:], jnp.float32) * scale
            ))
            parts = []
            for i in range(shape[0]):
                p = gen(subs[i])
                jax.block_until_ready(p)  # bound the peak to one f32 leaf
                parts.append(p)
            return {
                kk: jnp.stack([p[kk] for p in parts]) for kk in parts[0]
            }
        return {"w": rnd(*shape, scale=scale)}

    layers = {
        "input_norm": jnp.ones((L, H), jnp.float32),
        "q": proj(L, H, nq * hd),
        "k": proj(L, H, nkv * hd),
        "v": proj(L, H, nkv * hd),
        "o": proj(L, nq * hd, H),
        "post_norm": jnp.ones((L, H), jnp.float32),
        "gate": proj(L, H, I),
        "up": proj(L, H, I),
        "down": proj(L, I, H),
    }
    if spec.qkv_bias:
        layers["q"]["b"] = jnp.zeros((L, nq * hd), jnp.float32)
        layers["k"]["b"] = jnp.zeros((L, nkv * hd), jnp.float32)
        layers["v"]["b"] = jnp.zeros((L, nkv * hd), jnp.float32)
    if spec.use_qk_norm:
        layers["q_norm"] = jnp.ones((L, hd), jnp.float32)
        layers["k_norm"] = jnp.ones((L, hd), jnp.float32)
    params: dict = {
        "embed": {"w": rnd(spec.vocab_size, H)},
        "final_norm": jnp.ones((H,), jnp.float32),
        "layers": layers,
    }
    if not spec.tie_embeddings:
        params["lm_head"] = {"w": rnd(H, spec.vocab_size)}
    return _finalize(params, dtype, quantization, quant_group_size)


def replicate_kv_heads(params: dict, spec: ModelSpec, tp_size: int
                       ) -> tuple[dict, ModelSpec]:
    """KV-head replication for tp_size > num_kv_heads.

    The reference replicates KV heads across TP ranks when the shard count
    exceeds the head count (`nanovllmx/layers/linear.py:333-338`). The
    TPU-native equivalent is a LOAD-TIME transform: tile the k/v projection
    weights r = tp/nkv times along the head axis so the model effectively has
    `tp_size` KV heads — every shard then computes (and stores in its KV-pool
    shard) its own replica head locally, and all sharding rules stay plain
    dimension shards. New head j' reads original head j'//r; query head i
    (group size g' = nq/tp) maps to j' = i//g', consistent with the GQA
    grouping because (i//g')//r == i//g.
    """
    import dataclasses

    nkv = spec.num_kv_heads
    if tp_size <= nkv:
        return params, spec
    if tp_size % nkv or spec.num_heads % tp_size:
        raise ValueError(
            f"tp_size {tp_size} must be a multiple of num_kv_heads {nkv} "
            f"and divide num_heads {spec.num_heads}"
        )
    r = tp_size // nkv
    hd = spec.head_dim

    def tile_out(p: dict) -> dict:
        out = {}
        w = p["w"]  # [..., in, nkv*hd]
        wv = w.reshape(*w.shape[:-1], nkv, hd)
        out["w"] = jnp.repeat(wv, r, axis=-2).reshape(
            *w.shape[:-1], nkv * r * hd
        )
        if "scale" in p:
            s = p["scale"]  # per-channel [..., out] or per-group [..., g, out]
            sv = s.reshape(*s.shape[:-1], nkv, hd)
            out["scale"] = jnp.repeat(sv, r, axis=-2).reshape(
                *s.shape[:-1], nkv * r * hd
            )
        if "b" in p:
            b = p["b"]
            bv = b.reshape(*b.shape[:-1], nkv, hd)
            out["b"] = jnp.repeat(bv, r, axis=-2).reshape(
                *b.shape[:-1], nkv * r * hd
            )
        return out

    new_layers = dict(params["layers"])
    new_layers["k"] = tile_out(params["layers"]["k"])
    new_layers["v"] = tile_out(params["layers"]["v"])
    new_params = dict(params)
    new_params["layers"] = new_layers
    new_spec = dataclasses.replace(spec, num_kv_heads=tp_size)
    return new_params, new_spec


def _finalize(params: dict, dtype, quantization: str | None, group_size: int) -> dict:
    """Cast to device arrays; quantize matmul weights if requested.

    Layer matmuls follow `quantization` (int8 per-channel / int4 packed
    per-group); the embedding table and lm_head quantize to int8 per-row in
    EITHER mode (int4 embeddings measurably hurt quality; int8 already
    halves the per-decode-step lm_head read — see quantize_embed_rows)."""
    from nanovllmx_tpu.ops.linear import quantize_embed_rows

    if quantization:
        params = dict(params)
        params["embed"] = quantize_embed_rows(jnp.asarray(params["embed"]["w"]))
        if "lm_head" in params:
            params["lm_head"] = quantize_int8(
                jnp.asarray(params["lm_head"]["w"])
            )

    def convert(tree: dict, quant_ok: bool) -> dict:
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if "w" in v and not isinstance(v["w"], dict):
                    w = jnp.asarray(v["w"])
                    if "scale" in v and w.dtype in (jnp.int8, jnp.uint8):
                        # already quantized (embed/lm_head pre-pass above)
                        out[k] = {kk: jnp.asarray(vv) for kk, vv in v.items()}
                    elif quantization and quant_ok and k in _QUANT_KEYS:
                        q = (
                            quantize_int8(w)
                            if quantization == "int8"
                            else quantize_int4(w, group_size)
                        )
                        if "b" in v:
                            q["b"] = jnp.asarray(v["b"], dtype=dtype)
                        out[k] = q
                    else:
                        new = {"w": w.astype(dtype)}
                        if "b" in v:
                            new["b"] = jnp.asarray(v["b"], dtype=dtype)
                        out[k] = new
                else:
                    out[k] = convert(v, quant_ok)
            else:
                out[k] = jnp.asarray(v, dtype=dtype)
        return out

    return convert(params, True)
