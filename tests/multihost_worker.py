"""Worker for the 2-host CPU-simulation test (tests/test_multihost.py).

Each process simulates one host: 2 virtual CPU devices, a (pp=2, tp=2) mesh
spanning both processes, `jax.distributed` rendezvous, and the lockstep
mirror-engine (parallel/multihost.py). Host 0 submits requests and prints the
generated tokens as JSON; host 1 follows. Run directly:

    python tests/multihost_worker.py <host_id> <port> [--single]

--single runs the same workload single-process (4 local devices) to produce
the reference tokens.
"""

import asyncio
import json
import os
import sys

host_id = int(sys.argv[1])
port = sys.argv[2]
single = "--single" in sys.argv

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=" + ("4" if single else "2")
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nanovllmx_tpu.config import EngineConfig  # noqa: E402
from nanovllmx_tpu.engine.engine import Engine  # noqa: E402
from nanovllmx_tpu.llm import LLM  # noqa: E402
from nanovllmx_tpu.models.decoder import ModelSpec  # noqa: E402
from nanovllmx_tpu.parallel import multihost  # noqa: E402
from nanovllmx_tpu.runner.model_runner import ModelRunner  # noqa: E402
from nanovllmx_tpu.sampling_params import SamplingParams  # noqa: E402
from nanovllmx_tpu.weights.loader import init_random_params  # noqa: E402


class _NullTokenizer:
    eos_token_id = 0

    def decode(self, ids, skip_special_tokens=False):
        return ""


def main():
    cfg = EngineConfig(
        model="<mh-test>", max_bs=4, context_len=128, page_size=8,
        prefill_chunk=32, max_num_batched_tokens=32, num_kv_pages=48,
        dtype="fp32", tp_size=2, pp_size=2, decode_lookahead=4,
        num_hosts=1 if single else 2,
        coordinator_address="" if single else f"127.0.0.1:{port}",
        host_id=host_id,
        stall_watchdog_secs=0,
    )
    hid, nhosts = multihost.initialize(cfg)
    spec = ModelSpec(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=4, num_heads=4, num_kv_heads=2, head_dim=64,
        use_qk_norm=True, tie_embeddings=False, dtype="float32",
    )
    params = init_random_params(spec, dtype=jax.numpy.float32, seed=7)
    runner = ModelRunner(cfg, params=params, spec=spec)
    engine = Engine(cfg, runner, num_pages=runner.num_pages)
    llm = LLM(config=cfg, engine=engine, tokenizer=_NullTokenizer())

    if hid == 0:
        async def drive():
            prompts = [list(range(1, 13)), list(range(40, 70)), [7, 8, 9]]
            outs = await asyncio.gather(*(
                llm.generate_full(
                    p,
                    SamplingParams(temperature=0.0, max_new_tokens=5,
                                   ignore_eos=True),
                )
                for p in prompts
            ))
            return [o.token_ids for o in outs]

        tokens = asyncio.run(drive())
        llm.shutdown()
        print("TOKENS:" + json.dumps(tokens), flush=True)
    else:
        # follower: the engine thread mirrors host 0 until "stop" arrives
        llm._thread.join(timeout=120)
        print("FOLLOWER-DONE", flush=True)


if __name__ == "__main__":
    main()
