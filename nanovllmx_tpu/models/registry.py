"""Model registry: HF architecture name -> ModelSpec builder.

Counterpart of the reference registry (`nanovllmx/models/registry.py:3-5`,
Qwen3 only); the generic decoder covers the whole Llama family, so Llama /
Mistral / Qwen2 / Qwen3 all register here as spec variants.
"""

from __future__ import annotations

import json
import os

from nanovllmx_tpu.models.decoder import ModelSpec


def _rope_scaling(cfg: dict) -> dict:
    """Flatten HF `rope_scaling` into ModelSpec fields; raise on types the
    decoder does not implement (silently dropping them would produce wrong
    attention on e.g. Llama-3.1 / long-context checkpoints)."""
    rs = cfg.get("rope_scaling")
    if not rs:
        return {}
    # HF uses "rope_type" (new) or "type" (old); "default" means none
    rt = rs.get("rope_type", rs.get("type", "default"))
    if rt == "default":
        return {}
    if rt not in ("linear", "llama3"):
        raise NotImplementedError(
            f"rope_scaling type {rt!r} is not supported "
            "(supported: linear, llama3 — models/registry.py)"
        )
    return dict(
        rope_scaling_type=rt,
        rope_scaling_factor=float(rs.get("factor", 1.0)),
        rope_low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
        rope_high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
        rope_orig_max_pos=int(
            rs.get("original_max_position_embeddings", 8192)
        ),
    )


def _check_sliding_window(cfg: dict) -> None:
    """Reject configs whose checkpoints need sliding-window attention:
    neither attention path masks a window, so loading them would silently
    attend over the full context (wrong logits). Qwen2-style configs gate
    the window behind `use_sliding_window`."""
    window = cfg.get("sliding_window")
    if window is None:
        return
    if "use_sliding_window" in cfg and not cfg["use_sliding_window"]:
        return
    raise NotImplementedError(
        f"config requires sliding-window attention (sliding_window="
        f"{window}); this engine attends over the full context — "
        "use a non-windowed checkpoint (e.g. Mistral v0.2+ style configs "
        "set sliding_window: null)"
    )


def _common(cfg: dict) -> dict:
    nq = cfg["num_attention_heads"]
    _check_sliding_window(cfg)
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
        **_rope_scaling(cfg),
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
