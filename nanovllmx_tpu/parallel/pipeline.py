"""Pipeline parallelism: a REAL microbatch-overlapped schedule.

The reference pipelines by keeping `pp_size` batches in flight across worker
processes, relaying activations with NCCL send/recv
(`nanovllmx/core/engine.py:102-117`, `distributed/communication_op.py:253-346`).
The TPU-native equivalent built here is a **circular rotation schedule inside
one jitted program**: `jax.shard_map` manual over the "pp" mesh axis (tp/dp
stay GSPMD-managed), with

* per-stage LOCAL layer slices — the layer-stacked parameter and KV-pool
  arrays are sharded on their leading layer axis over "pp", so rank r holds
  layers [r*L/pp, (r+1)*L/pp) and runs `models.decoder.run_layers` on them;
* `lax.ppermute` rotating microbatch activations stage r -> r+1 each round;
* a `psum`-broadcast token feedback path from the last stage to stage 0 for
  the decode lookahead chain.

Schedule (decode superstep, nmb = pp microbatches of Bm = B/pp rows):
round t has stage r working on flight f = t - r, i.e. microbatch m = f % nmb
at inner decode step k = f // nmb. Stage 0 runs microbatch k+1's slab while
stage 1 runs microbatch k's — all pp stages compute concurrently in steady
state. A flight finishes the last stage at round f + pp - 1; with nmb == pp
its sampled token arrives back at stage 0 exactly one round before flight
f + nmb needs it, so the feedback chain adds NO bubble. Total rounds
R = K*nmb + pp - 1: the fill/drain bubble is (pp-1)/R (~3% at pp=2, K=16).

Prefill pipelines the flat token buffer in nmb contiguous spans (no feedback;
R = nmb + pp - 1). Splitting a sequence across spans is safe: span m's KV is
written when it passes stage r, which is always BEFORE span m' > m arrives at
stage r, and attention masks causally within the page table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nanovllmx_tpu.models.decoder import (
    compute_logits,
    embed_tokens,
    run_layers,
)
from nanovllmx_tpu.ops import attention as attn_ops
from nanovllmx_tpu.ops.layers import rms_norm
from nanovllmx_tpu.ops.sampler import sample
from nanovllmx_tpu.parallel.mesh import kv_pool_pspecs, param_pspecs


def decode_schedule(pp: int, K: int) -> list[list[tuple[int, int, int]]]:
    """The decode rotation schedule as data, for inspection/testing: entry
    [t][r] = (flight, microbatch, step) that stage r computes at round t, or
    None when idle (fill/drain). This is the SAME formula the jitted round
    body uses (f = t - r; m = f % nmb; k = f // nmb with nmb = pp)."""
    nmb = pp
    R = K * nmb + pp - 1
    table = []
    for t in range(R):
        row = []
        for r in range(pp):
            f = t - r
            row.append(
                (f, f % nmb, f // nmb) if 0 <= f < K * nmb else None
            )
        table.append(row)
    return table


def _pp_only(ps: P) -> P:
    """Strip non-"pp" axes from a PartitionSpec: shard_map is manual over
    "pp" only; tp/dp shardings ride through as auto (GSPMD) axes."""
    return P(*(("pp" if a == "pp" else None) for a in ps))


def _pp_specs(runner):
    pspec = param_pspecs(runner.spec, runner.params, pp=True)
    pspec = jax.tree.map(
        _pp_only, pspec, is_leaf=lambda x: isinstance(x, P)
    )
    structure = runner.kv_pool
    kv_spec = kv_pool_pspecs(structure, pp=True)
    kv_spec = jax.tree.map(
        _pp_only, kv_spec, is_leaf=lambda x: isinstance(x, P)
    )
    return pspec, kv_spec


def _rotate(x, pp: int):
    return jax.lax.ppermute(
        x, "pp", [(i, (i + 1) % pp) for i in range(pp)]
    )


def build_pp_decode_superstep(runner, B: int, W: int):
    """Pipelined counterpart of ModelRunner._build_decode_superstep: same
    signature and host-visible contract; K inner steps per dispatch with the
    token feedback riding the pipeline (see module docstring).

    With the Pallas deferred-window path active (`runner._use_window`), the
    schedule mirrors the single-chip superstep: each round's K/V rows land
    in the layer-sharded bf16 window buffers (microbatch m at buffer rows
    [m*Bm, (m+1)*Bm); invalid fill/drain rounds park their garbage write in
    the padding rows past max_bs), the attention kernel reads them via
    `window_row0`, and each stage bulk-stores its local layer slice once at
    the end — pp>1 no longer pays the per-step row scatter + scale RMW the
    single-chip path eliminated (r3 VERDICT #6)."""
    spec = runner.spec
    cfg = runner.config
    pp = cfg.pp_size
    ps = cfg.page_size
    K = cfg.decode_lookahead
    nmb = pp
    Bm = -(-B // nmb)
    Bp = Bm * nmb
    H = spec.hidden_size
    oob = int(attn_ops.OOB_SLOT)
    backend = runner.attention_backend
    use_window = runner._use_window
    park_row = cfg.max_bs  # first padding row of the window buffers
    param_specs, kv_specs = _pp_specs(runner)

    def inner(params, kv_pool, page_table_dev, token_state,
              slots_arr, ints, floats, plan_arrays, wk, wv, key):
        r = jax.lax.axis_index("pp")
        is_first = r == 0
        is_last = r == pp - 1
        cdtype = params["final_norm"].dtype

        safe = jnp.minimum(slots_arr, page_table_dev.shape[0] - 1)
        table = jax.lax.slice(
            page_table_dev, (0, 0), (page_table_dev.shape[0], W)
        )[safe]
        tokens0 = token_state[safe]
        lens0 = ints[:, 1]
        active = ints[:, 2] > 0
        top_ks = ints[:, 3]
        temps, top_ps, min_ps = floats[:, 0], floats[:, 1], floats[:, 2]
        if Bp != B:
            pad = Bp - B
            table = jnp.pad(table, ((0, pad), (0, 0)))
            tokens0 = jnp.pad(tokens0, (0, pad))
            lens0 = jnp.pad(lens0, (0, pad))
            active = jnp.pad(active, (0, pad))
            top_ks = jnp.pad(top_ks, (0, pad))
            temps = jnp.pad(temps, (0, pad))
            top_ps = jnp.pad(top_ps, (0, pad))
            min_ps = jnp.pad(min_ps, (0, pad))
        tableM = table.reshape(nmb, Bm, W)
        lensM = lens0.reshape(nmb, Bm)
        actM = active.reshape(nmb, Bm)
        tempsM = temps.reshape(nmb, Bm)
        toppM = top_ps.reshape(nmb, Bm)
        topkM = top_ks.reshape(nmb, Bm)
        minpM = min_ps.reshape(nmb, Bm)
        rows = jnp.arange(Bm)

        def idx(arr, m):
            return jax.lax.dynamic_index_in_dim(arr, m, 0, keepdims=False)

        R = K * nmb + pp - 1

        def round_body(t, carry):
            x_buf, kv_pool, wk, wv, tok_fb, outs = carry
            f = t - r                       # this stage's flight
            valid = (f >= 0) & (f < K * nmb)
            fc = jnp.clip(f, 0, K * nmb - 1)
            m = jax.lax.rem(fc, nmb)
            k = jax.lax.div(fc, nmb)
            tok_m = idx(tok_fb, m)
            lens_m = idx(lensM, m)
            act_m = idx(actM, m)
            table_m = idx(tableM, m)        # [Bm, W]
            pos = lens_m + k
            page_idx = table_m[rows, jnp.minimum(pos // ps, W - 1)]
            ok = act_m & valid
            slots = jnp.where(ok, page_idx * ps + pos % ps, oob)

            if use_window:
                # pool part of attention is constant across the K steps;
                # the window rows ride wk/wv (row m*Bm + b for microbatch m)
                seq_lens = jnp.where(ok, lens_m, 0)
                wlens = jnp.where(ok, k + 1, 0)
                wrow0 = m * Bm
                from nanovllmx_tpu.ops.pallas.decode_attention import (
                    paged_decode_attention_pallas,
                )

                def attend(q, kv_pool, wk, wv, layer):
                    return paged_decode_attention_pallas(
                        q, kv_pool, table_m, seq_lens, spec.scale,
                        layer=layer, window=(wk, wv, wlens),
                        window_row0=wrow0,
                    )
            else:
                seq_lens = jnp.where(ok, pos + 1, 0)
                if backend == "pallas":
                    from nanovllmx_tpu.ops.pallas.decode_attention import (
                        paged_decode_attention_pallas,
                    )

                    def attend(q, kv_pool, layer):
                        return paged_decode_attention_pallas(
                            q, kv_pool, table_m, seq_lens, spec.scale,
                            layer=layer,
                        )
                else:

                    def attend(q, kv_pool, layer):
                        return attn_ops.paged_decode_attention_xla(
                            q, kv_pool, table_m, seq_lens, spec.scale,
                            layer=layer,
                        )

            x_in = jax.lax.cond(
                is_first,
                lambda: embed_tokens(params, tok_m).astype(cdtype),
                lambda: x_buf,
            )
            if use_window:
                write_row0 = jnp.where(valid, m * Bm, park_row)
                x_out, kv_pool, wk, wv = run_layers(
                    params["layers"], spec, x_in, pos, kv_pool, None,
                    attend, window=(wk, wv, k, write_row0),
                )
            else:
                x_out, kv_pool = run_layers(
                    params["layers"], spec, x_in, pos, kv_pool, slots,
                    attend, unique_pages=True,
                    pallas_store=backend == "pallas",
                )

            def do_sample():
                h = rms_norm(x_out, params["final_norm"], spec.rms_norm_eps)
                logits = compute_logits(params, spec, h)
                sub = jax.random.fold_in(key, fc)
                nxt = sample(
                    logits, idx(tempsM, m), idx(toppM, m), idx(topkM, m),
                    idx(minpM, m), sub,
                )
                return jnp.where(act_m, nxt, tok_m)

            nxt = jax.lax.cond(
                is_last & valid, do_sample,
                lambda: jnp.zeros((Bm,), jnp.int32),
            )
            # feedback: the flight the LAST stage finished this round
            # (replicated index math — f_last does not involve r)
            f_last = t - (pp - 1)
            vlast = (f_last >= 0) & (f_last < K * nmb)
            flc = jnp.clip(f_last, 0, K * nmb - 1)
            m_l = jax.lax.rem(flc, nmb)
            k_l = jax.lax.div(flc, nmb)
            nxt_b = jax.lax.psum(nxt, "pp")  # only the last stage is nonzero
            cur_fb = idx(tok_fb, m_l)
            tok_fb = jax.lax.dynamic_update_index_in_dim(
                tok_fb, jnp.where(vlast, nxt_b, cur_fb), m_l, 0
            )
            cur_out = jax.lax.dynamic_slice(outs, (k_l, m_l, 0), (1, 1, Bm))
            outs = jax.lax.dynamic_update_slice(
                outs, jnp.where(vlast, nxt_b[None, None, :], cur_out),
                (k_l, m_l, 0),
            )
            x_buf = _rotate(x_out, pp)
            return (x_buf, kv_pool, wk, wv, tok_fb, outs)

        carry0 = (
            jnp.zeros((Bm, H), cdtype),
            kv_pool,
            wk,
            wv,
            tokens0.reshape(nmb, Bm),
            jnp.zeros((K, nmb, Bm), jnp.int32),
        )
        _, kv_pool, wk, wv, tok_fb, outs = jax.lax.fori_loop(
            0, R, round_body, carry0
        )
        if use_window:
            # each stage bulk-stores its LOCAL layer slice of the window
            # into its local pool slice (the host plan is layer-agnostic)
            store_plan = dict(zip(
                ("full_dst", "full_src", "b16_dst", "b16_src",
                 "row_dst", "row_src", "spage", "smask", "swin0"),
                plan_arrays,
            ))
            kv_pool = attn_ops.bulk_store_window(kv_pool, wk, wv, store_plan)
        last = tok_fb.reshape(Bp)[:B]
        token_state = token_state.at[slots_arr].set(last, mode="drop")
        toks = outs.reshape(K, Bp)[:, :B]
        return toks, kv_pool, token_state, wk, wv

    wspec = P("pp") if use_window else P()
    shmapped = jax.shard_map(
        inner,
        mesh=runner.mesh,
        axis_names={"pp"},
        in_specs=(param_specs, kv_specs, P(), P(), P(), P(), P(), P(),
                  wspec, wspec, P()),
        out_specs=(P(), kv_specs, P(), wspec, wspec),
        check_vma=False,
    )
    jitted = jax.jit(shmapped, donate_argnums=(1, 3, 8, 9))

    def with_extras(params, kv_pool, page_table_dev, token_state,
                    slots_arr, ints, floats, plan_arrays, wk, wv, key):
        return jitted(
            params, kv_pool, page_table_dev, token_state,
            slots_arr, ints, floats, plan_arrays, wk, wv, key,
        )

    return with_extras


def build_pp_prefill_fn(runner):
    """Pipelined counterpart of ModelRunner._build_prefill_fn: the flat
    token buffer is split into nmb contiguous spans that rotate through the
    stages; the last stage stashes final hidden states and samples once."""
    spec = runner.spec
    cfg = runner.config
    pp = cfg.pp_size
    nmb = pp
    H = spec.hidden_size
    oob = int(attn_ops.OOB_SLOT)
    backend = runner.attention_backend
    param_specs, kv_specs = _pp_specs(runner)

    def inner(params, kv_pool, token_ids, positions, page_table,
              q_indptr, q_start, kv_lens, seg_ids, write_slots,
              sample_idx, temps, top_ps, top_ks, min_ps, key):
        r = jax.lax.axis_index("pp")
        is_first = r == 0
        is_last = r == pp - 1
        cdtype = params["final_norm"].dtype
        NT = token_ids.shape[0]
        NTm = -(-NT // nmb)
        NTp = NTm * nmb
        if NTp != NT:
            padn = NTp - NT
            token_ids = jnp.pad(token_ids, (0, padn))
            positions = jnp.pad(positions, (0, padn))
            seg_ids = jnp.pad(seg_ids, (0, padn))
            write_slots = jnp.pad(
                write_slots, (0, padn), constant_values=oob
            )
        tokensM = token_ids.reshape(nmb, NTm)
        posM = positions.reshape(nmb, NTm)
        segM = seg_ids.reshape(nmb, NTm)
        slotsM = write_slots.reshape(nmb, NTm)

        def idx(arr, m):
            return jax.lax.dynamic_index_in_dim(arr, m, 0, keepdims=False)

        R = nmb + pp - 1

        def round_body(t, carry):
            x_buf, kv_pool, hbuf = carry
            f = t - r
            valid = (f >= 0) & (f < nmb)
            m = jnp.clip(f, 0, nmb - 1)
            tok_m = idx(tokensM, m)
            pos_m = idx(posM, m)
            seg_m = idx(segM, m)
            slots_m = jnp.where(valid, idx(slotsM, m), oob)

            if backend == "pallas":
                from nanovllmx_tpu.ops.pallas.prefill_attention import (
                    BLOCK_Q,
                    ragged_prefill_attention_pallas,
                )

                # per-span ragged metadata, derived from the global arrays:
                # span m covers flat tokens [m*NTm, (m+1)*NTm)
                t0 = m * NTm
                qi_m = jnp.clip(q_indptr - t0, 0, NTm)
                # first query position of each sequence within the span
                q_start_m = q_start + jnp.maximum(0, t0 - q_indptr[:-1])

                def attend(q, kv_pool, layer):
                    # BLOCK_Q tail headroom: the kernel's last q block may
                    # overhang its sequence's range (module contract)
                    qp = jnp.pad(q, ((0, BLOCK_Q), (0, 0), (0, 0)))
                    out = ragged_prefill_attention_pallas(
                        qp, kv_pool, page_table, qi_m, q_start_m, kv_lens,
                        spec.scale, layer=layer,
                    )
                    return out[:NTm]
            else:

                def attend(q, kv_pool, layer):
                    return attn_ops.ragged_prefill_attention_xla(
                        q, kv_pool, page_table, seg_m, pos_m,
                        spec.scale, layer=layer,
                    )

            x_in = jax.lax.cond(
                is_first,
                lambda: embed_tokens(params, tok_m).astype(cdtype),
                lambda: x_buf,
            )
            x_out, kv_pool = run_layers(
                params["layers"], spec, x_in, pos_m, kv_pool, slots_m,
                attend, pallas_store=backend == "pallas",
            )
            hbuf = jax.lax.cond(
                is_last & valid,
                lambda: jax.lax.dynamic_update_slice(
                    hbuf, x_out, (m * NTm, 0)
                ),
                lambda: hbuf,
            )
            x_buf = _rotate(x_out, pp)
            return (x_buf, kv_pool, hbuf)

        carry0 = (
            jnp.zeros((NTm, H), cdtype),
            kv_pool,
            jnp.zeros((NTp, H), cdtype),
        )
        _, kv_pool, hbuf = jax.lax.fori_loop(0, R, round_body, carry0)

        S = sample_idx.shape[0]

        def do_sample():
            h = rms_norm(
                jnp.take(hbuf, sample_idx, axis=0),
                params["final_norm"], spec.rms_norm_eps,
            )
            logits = compute_logits(params, spec, h)
            return sample(logits, temps, top_ps, top_ks, min_ps, key)

        toks = jax.lax.cond(
            is_last, do_sample, lambda: jnp.zeros((S,), jnp.int32)
        )
        toks = jax.lax.psum(toks, "pp")  # broadcast from the last stage
        return toks, kv_pool

    shmapped = jax.shard_map(
        inner,
        mesh=runner.mesh,
        axis_names={"pp"},
        in_specs=(param_specs, kv_specs) + (P(),) * 14,
        out_specs=(P(), kv_specs),
        check_vma=False,
    )
    jitted = jax.jit(shmapped, donate_argnums=(1,))

    def with_plan(params, kv_pool, *args):
        # single-chip prefill takes a host-built store plan before the key
        # (ModelRunner._dispatch_prefill); the pp schedule stores KV through
        # the generic per-row path and ignores it
        *rest, _plan_arrays, key = args
        return jitted(params, kv_pool, *rest, key)

    return with_plan
