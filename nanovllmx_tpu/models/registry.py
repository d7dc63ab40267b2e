"""Model registry: HF architecture name -> ModelSpec builder.

Counterpart of the reference registry (`nanovllmx/models/registry.py:3-5`,
Qwen3 only); the generic decoder covers the whole Llama family, so Llama /
Mistral / Qwen2 / Qwen3 all register here as spec variants.
"""

from __future__ import annotations

import json
import os

from nanovllmx_tpu.models.decoder import ModelSpec


def _common(cfg: dict) -> dict:
    nq = cfg["num_attention_heads"]
    return dict(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=nq,
        num_kv_heads=cfg.get("num_key_value_heads", nq),
        head_dim=cfg.get("head_dim") or cfg["hidden_size"] // nq,
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 10000.0),
        tie_embeddings=cfg.get("tie_word_embeddings", False),
        hidden_act=cfg.get("hidden_act", "silu"),
        dtype=cfg.get("torch_dtype", "bfloat16"),
    )


def _qwen3(cfg: dict) -> ModelSpec:
    return ModelSpec(**_common(cfg), use_qk_norm=True, qkv_bias=False)


def _qwen2(cfg: dict) -> ModelSpec:
    return ModelSpec(**_common(cfg), use_qk_norm=False, qkv_bias=True)


def _llama(cfg: dict) -> ModelSpec:
    return ModelSpec(
        **_common(cfg),
        use_qk_norm=False,
        qkv_bias=cfg.get("attention_bias", False),
    )


MODEL_REGISTRY = {
    "Qwen3ForCausalLM": _qwen3,
    "Qwen2ForCausalLM": _qwen2,
    "LlamaForCausalLM": _llama,
    "MistralForCausalLM": _llama,
}


def load_model_spec(model_dir: str) -> ModelSpec:
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    for arch in cfg.get("architectures", []):
        if arch in MODEL_REGISTRY:
            return MODEL_REGISTRY[arch](cfg)
    raise ValueError(
        f"unsupported architectures {cfg.get('architectures')}; "
        f"known: {sorted(MODEL_REGISTRY)}"
    )
