"""nanovllmx_tpu — a TPU-native continuous-batching LLM inference engine.

Built from scratch with the capabilities of izmttk/nano-vllm-x (reference at
/root/reference), redesigned TPU-first: JAX/XLA/Pallas compute, a single
controller process feeding jitted bucketed step functions, page-granular
paged KV cache in HBM, radix-tree prefix caching with admission-time reuse,
and sharding over a `jax.sharding.Mesh` instead of NCCL process groups.
"""

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.sampling_params import SamplingParams

__version__ = "0.1.0"

__all__ = ["EngineConfig", "SamplingParams", "LLM"]


def __getattr__(name):
    # LLM pulls in jax/transformers; import lazily so pure-CPU unit tests of
    # the engine core stay light.
    if name == "LLM":
        from nanovllmx_tpu.llm import LLM
        return LLM
    raise AttributeError(name)
