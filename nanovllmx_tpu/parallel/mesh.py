"""Device mesh + sharding rules for tensor parallelism.

The reference's whole `distributed/` package — NCCL/gloo process groups
(`parallel_state.py`), explicit all_reduce/all_gather wrappers
(`communication_op.py`), Megatron column/row-parallel linear layers
(`layers/linear.py`) — collapses on TPU into a `jax.sharding.Mesh` plus
per-parameter `NamedSharding`s: the XLA partitioner inserts the psum after
row-parallel contractions and the all-gather for vocab-parallel logits,
scheduling them over ICI and overlapping with compute (SURVEY.md §2.2).

Sharding layout (axis "tp"):
  q/k/v/gate/up weights  -> shard the OUTPUT dim   (column-parallel,
                            ref `ColumnParallelLinear`, linear.py:79-177)
  o/down weights         -> shard the INPUT dim    (row-parallel -> psum,
                            ref `RowParallelLinear`, linear.py:179-286)
  embed / lm_head        -> shard the vocab dim    (vocab-parallel,
                            ref `vocab_parallel_embedding.py`)
  norms / biases-of-row  -> replicated
  KV pool                -> shard the kv-heads dim (same choice as the
                            reference splitting kv heads across TP ranks,
                            `models/qwen3.py:75-83`)

Weights are stored unfused precisely so every rule above is a single
dimension shard (see models/decoder.py docstring).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nanovllmx_tpu.models.decoder import ModelSpec


def make_mesh(tp_size: int, dp_size: int = 1, pp_size: int = 1, devices=None) -> Mesh:
    """3-axis device mesh (pp, dp, tp).

    tp rides the innermost axis so its collectives use adjacent devices
    (ICI neighbours on real hardware), matching the reference's contiguous
    TP groups (`distributed/parallel_state.py:77-84`); pp is outermost,
    the axis that crosses hosts/DCN in multi-host deployments."""
    devices = devices if devices is not None else jax.devices()
    n = pp_size * dp_size * tp_size
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(pp_size, dp_size, tp_size)
    return Mesh(arr, ("pp", "dp", "tp"))


def _ns(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def param_pspecs(spec: ModelSpec, params: dict, pp: bool = False) -> dict:
    """PartitionSpec pytree matching the parameter pytree structure
    (including quantized {"w","scale"} leaves).

    With `pp`, the stacked layer axis of every per-layer array is sharded
    over the "pp" mesh axis — each pipeline stage holds its contiguous slice
    of layers (the sharded-scan analogue of the reference's
    `get_pp_indices` layer slicing, `distributed/utils.py:1-17`)."""
    lead = "pp" if pp else None

    def proj(p: dict, shard_dim: str) -> dict:
        # shard_dim: "out" (column-parallel) or "in" (row-parallel)
        # all per-layer arrays have the stacked L axis first
        out = {}
        w = p["w"]
        if shard_dim == "out":
            out["w"] = P(lead, *([None] * (w.ndim - 2)), "tp")
            if "scale" in p:  # scale follows the output dim
                s = p["scale"]
                out["scale"] = P(lead, *([None] * (s.ndim - 2)), "tp")
            if "b" in p:
                out["b"] = P(lead, *([None] * (p["b"].ndim - 2)), "tp")
        else:  # row-parallel: shard the contraction (second-to-last) dim
            out["w"] = P(lead, *([None] * (w.ndim - 3)), "tp", None)
            if "scale" in p:
                s = p["scale"]
                if s.ndim == w.ndim:  # per-group scales follow the in dim
                    out["scale"] = P(lead, *([None] * (s.ndim - 3)), "tp", None)
                else:  # per-channel scales are on the out dim: replicate
                    out["scale"] = P(lead)
            if "b" in p:
                out["b"] = P(lead)  # row-parallel bias applied once
        return out

    layers = params["layers"]
    lp: dict = {
        "input_norm": P(lead),
        "post_norm": P(lead),
        "q": proj(layers["q"], "out"),
        "k": proj(layers["k"], "out"),
        "v": proj(layers["v"], "out"),
        "o": proj(layers["o"], "in"),
        "gate": proj(layers["gate"], "out"),
        "up": proj(layers["up"], "out"),
        "down": proj(layers["down"], "in"),
    }
    if "q_norm" in layers:
        lp["q_norm"] = P(lead)
        lp["k_norm"] = P(lead)
    embed: dict = {"w": P("tp", None)}  # vocab-parallel
    if "scale" in params["embed"]:  # int8 per-row scales follow the vocab dim
        embed["scale"] = P("tp")
    specs: dict = {
        "embed": embed,
        "final_norm": P(),
        "layers": lp,
    }
    if "lm_head" in params:
        lmh: dict = {"w": P(None, "tp")}
        if "scale" in params["lm_head"]:  # per-out-channel: vocab dim
            lmh["scale"] = P("tp")
        specs["lm_head"] = lmh
    return specs


def kv_pool_pspec(pp: bool = False) -> P:
    """[L, 2, P, ps, nkv, hd]: layers over pp stages, kv heads over tp."""
    return P("pp" if pp else None, None, None, None, "tp", None)


def kv_pool_pspecs(kv_pool, pp: bool = False):
    """PartitionSpec pytree for a pool: raw array or {kv, scale} dict.
    Scales are per-token (no head dim), so only the layer axis shards."""
    if isinstance(kv_pool, dict):
        return {
            "kv": kv_pool_pspec(pp=pp),
            "scale": P("pp" if pp else None, None, None, None),
        }
    return kv_pool_pspec(pp=pp)


def shard_params(params: dict, spec: ModelSpec, mesh: Mesh) -> dict:
    """device_put the parameter pytree with its NamedShardings."""
    pp = "pp" in mesh.axis_names and mesh.shape["pp"] > 1
    pspecs = param_pspecs(spec, params, pp=pp)
    # params drives the tree structure; pspecs leaves (PartitionSpec) are
    # picked up at params' leaf positions
    return jax.tree.map(
        lambda x, ps: jax.device_put(x, NamedSharding(mesh, ps)),
        params,
        pspecs,
    )


def validate_tp(spec: ModelSpec, tp_size: int, pp_size: int = 1) -> None:
    """Divisibility rules, mirroring the reference's assertions
    (`models/qwen3.py:71-83`). tp > num_kv_heads is allowed when divisible:
    the runner applies load-time KV-head replication
    (`weights.loader.replicate_kv_heads`, ref `layers/linear.py:333-338`)."""
    if spec.num_heads % tp_size:
        raise ValueError(
            f"num_heads {spec.num_heads} not divisible by tp_size {tp_size}"
        )
    if tp_size > spec.num_kv_heads:
        if tp_size % spec.num_kv_heads:
            raise ValueError(
                f"tp_size {tp_size} > num_kv_heads {spec.num_kv_heads} "
                "requires tp to be a multiple of num_kv_heads "
                "(KV-head replication)"
            )
    elif spec.num_kv_heads % tp_size:
        raise ValueError(
            f"num_kv_heads {spec.num_kv_heads} not divisible by tp {tp_size}"
        )
    if spec.num_layers % pp_size:
        raise ValueError(
            f"num_layers {spec.num_layers} not divisible by pp {pp_size}"
        )
