"""Build tiny random-weight HF checkpoints for golden-token tests.

No network egress in this environment, so real checkpoints are unavailable;
correctness is gated on token-exactness vs the HF transformers (torch CPU)
implementation on tiny models of the same architecture (SURVEY.md §4).
"""

import json
import os

import torch


def make_tiny_qwen3(tmpdir: str, vocab_size: int = 128) -> str:
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=512,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(cfg)
    path = os.path.join(tmpdir, "tiny-qwen3")
    model.save_pretrained(path, safe_serialization=True)
    return path


def make_tiny_qwen3_tied(tmpdir: str, vocab_size: int = 128) -> str:
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=512,
        tie_word_embeddings=True,
        torch_dtype="float32",
    )
    torch.manual_seed(1)
    model = Qwen3ForCausalLM(cfg)
    path = os.path.join(tmpdir, "tiny-qwen3-tied")
    model.save_pretrained(path, safe_serialization=True)
    return path


def make_tiny_llama(tmpdir: str, vocab_size: int = 128) -> str:
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    torch.manual_seed(2)
    model = LlamaForCausalLM(cfg)
    path = os.path.join(tmpdir, "tiny-llama")
    model.save_pretrained(path, safe_serialization=True)
    return path


def make_tiny_llama31(tmpdir: str, vocab_size: int = 128) -> str:
    """Llama-3.1-style config: llama3 rope scaling over a small original
    max-position so the scaled frequency bands are actually exercised at
    test positions."""
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        },
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    torch.manual_seed(4)
    model = LlamaForCausalLM(cfg)
    path = os.path.join(tmpdir, "tiny-llama31")
    model.save_pretrained(path, safe_serialization=True)
    return path


def make_tiny_qwen2(tmpdir: str, vocab_size: int = 128) -> str:
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    torch.manual_seed(3)
    model = Qwen2ForCausalLM(cfg)
    path = os.path.join(tmpdir, "tiny-qwen2")
    model.save_pretrained(path, safe_serialization=True)
    return path


def add_tiny_tokenizer(model_dir: str, vocab_size: int = 128) -> None:
    """Write a character-level tokenizer (tokenizer.json) into the model dir
    so LLM/server tests run fully offline. ids: chars at their ASCII codes
    (printable), eos = id 0 '<eos>'."""
    import json

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Split

    vocab = {"<eos>": 0, "<unk>": 1}
    for c in range(32, min(127, vocab_size)):
        vocab[chr(c)] = c
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Split("", "isolated")
    tok.save(os.path.join(model_dir, "tokenizer.json"))
    cfg = {
        "tokenizer_class": "PreTrainedTokenizerFast",
        "eos_token": "<eos>",
        "unk_token": "<unk>",
        "model_max_length": 512,
        "chat_template": (
            "{% for m in messages %}{{ m['role'] }}: {{ m['content'] }}\n"
            "{% endfor %}assistant:"
        ),
    }
    with open(os.path.join(model_dir, "tokenizer_config.json"), "w") as f:
        json.dump(cfg, f)


def hf_greedy_tokens(model_dir: str, prompt_ids: list[int], n: int) -> list[int]:
    """Reference greedy continuation from HF transformers (torch CPU)."""
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir, torch_dtype=torch.float32)
    model.eval()
    ids = torch.tensor([prompt_ids], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            ids, max_new_tokens=n, do_sample=False, use_cache=True,
            pad_token_id=0,
        )
    return out[0, len(prompt_ids):].tolist()


def hf_logits(model_dir: str, prompt_ids: list[int]):
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir, torch_dtype=torch.float32)
    model.eval()
    ids = torch.tensor([prompt_ids], dtype=torch.long)
    with torch.no_grad():
        return model(ids).logits[0].numpy()


def assert_greedy_close(model_dir: str, prompt_ids: list[int],
                        got: list[int], atol: float = 5e-3):
    """Teacher-forced near-tie-tolerant greedy check.

    Random-init tiny models can have near-tied top logits, where fp32 backend
    noise (torch/oneDNN vs XLA, ~1e-3 on these models) legitimately flips the
    argmax. For each generated token, require it to either BE the HF argmax or
    be within `atol` of the argmax logit; architecture bugs produce O(1)
    logit errors and still fail loudly.
    """
    import numpy as np

    full = list(prompt_ids) + list(got)
    logits = hf_logits(model_dir, full)
    for i, tok in enumerate(got):
        row = logits[len(prompt_ids) + i - 1]
        top = int(np.argmax(row))
        if tok != top:
            gap = float(row[top] - row[tok])
            assert gap < atol, (
                f"step {i}: token {tok} vs HF argmax {top}, logit gap {gap:.4f}"
            )
