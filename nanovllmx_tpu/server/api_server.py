"""OpenAI-compatible API server (aiohttp).

Counterpart of the reference FastAPI server (`nanovllmx/entrypoints/openai/
api_server.py`): /v1/models, /v1/completions, /v1/chat/completions, CORS,
validation-error -> 400 envelope, CLI flags (`api_server.py:103-134`) plus
TPU-native knobs. Built on aiohttp (this image ships no fastapi/uvicorn);
request cancellation needs no explicit race here — aiohttp cancels the
handler task on client disconnect, which propagates CancelledError into
`LLM.generate` and aborts the sequence (the role of the reference's
`with_cancellation` decorator, `entrypoints/utils.py:18-60`).
"""

from __future__ import annotations

import argparse
import json

from aiohttp import web
from pydantic import ValidationError

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.server import protocol as P
from nanovllmx_tpu.server.serving import OpenAIServing


def _error(msg: str, code: int = 400) -> web.Response:
    return web.json_response(
        P.ErrorResponse(message=msg, code=code).model_dump(), status=code
    )


@web.middleware
async def cors_middleware(request: web.Request, handler):
    if request.method == "OPTIONS":
        resp = web.Response()
    else:
        resp = await handler(request)
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Methods"] = "*"
    resp.headers["Access-Control-Allow-Headers"] = "*"
    return resp


async def _stream_sse(request: web.Request, agen) -> web.StreamResponse:
    resp = web.StreamResponse(
        status=200,
        headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
        },
    )
    await resp.prepare(request)
    try:
        async for chunk in agen:
            await resp.write(chunk.encode())
        await resp.write_eof()
    except (ConnectionResetError, ConnectionError) as e:
        # client went away mid-stream; closing the generator aborts the
        # sequence engine-side (CancelledError path in LLM.generate)
        await agen.aclose()
    return resp


K_CONFIG = web.AppKey("config", EngineConfig)
K_LLM = web.AppKey("llm", object)
K_SERVING = web.AppKey("serving", OpenAIServing)


def build_app(config: EngineConfig, llm=None, model_name: str | None = None) -> web.Application:
    model_name = model_name or config.model
    app = web.Application(middlewares=[cors_middleware])
    app[K_CONFIG] = config
    app[K_LLM] = llm

    async def on_startup(app: web.Application):
        if app[K_LLM] is None:
            from nanovllmx_tpu.llm import LLM

            app[K_LLM] = LLM(config=config)
        await app[K_LLM].ready()
        # precompile every shape bucket before taking traffic (the reference
        # captures its CUDA-graph ladder at startup, model_runner.py:332-417)
        runner = getattr(app[K_LLM].engine, "runner", None)
        warmup = getattr(runner, "warmup", None)
        if warmup is not None:
            warmup()
        app[K_SERVING] = OpenAIServing(app[K_LLM], model_name)

    async def on_cleanup(app: web.Application):
        if app[K_LLM] is not None:
            app[K_LLM].shutdown()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)

    async def health(request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def list_models(request: web.Request) -> web.Response:
        return web.json_response(
            P.ModelList(data=[P.ModelCard(id=model_name)]).model_dump()
        )

    async def create_completion(request: web.Request):
        try:
            req = P.CompletionRequest(**await request.json())
        except (ValidationError, json.JSONDecodeError, TypeError) as e:
            return _error(str(e))
        serving: OpenAIServing = request.app[K_SERVING]
        invalid = serving.validate_completion(req)
        if invalid:
            return _error(invalid)
        result = await serving.create_completion(req)
        if req.stream:
            return await _stream_sse(request, result)
        return web.json_response(result.model_dump())

    async def create_chat_completion(request: web.Request):
        try:
            req = P.ChatCompletionRequest(**await request.json())
        except (ValidationError, json.JSONDecodeError, TypeError) as e:
            return _error(str(e))
        serving: OpenAIServing = request.app[K_SERVING]
        invalid = serving.validate_chat(req)
        if invalid:
            return _error(invalid)
        result = await serving.create_chat_completion(req)
        if req.stream:
            return await _stream_sse(request, result)
        return web.json_response(result.model_dump())

    async def metrics(request: web.Request) -> web.Response:
        m = request.app[K_LLM].engine.metrics
        if request.query.get("format") == "prometheus":
            return web.Response(text=m.prometheus(), content_type="text/plain")
        return web.json_response(m.snapshot())

    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics)
    app.router.add_get("/v1/models", list_models)
    app.router.add_post("/v1/completions", create_completion)
    app.router.add_post("/v1/chat/completions", create_chat_completion)
    return app


def make_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="nanovllmx_tpu OpenAI API server")
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--max-bs", type=int, default=256)
    p.add_argument("--context-len", type=int, default=4096)
    # 128 = the measured production value on v5e (one 128-lane row per page;
    # required by the int8-KV Pallas decode path). Smaller pages waste less
    # pool on short sequences but forfeit the int8 kernel.
    p.add_argument("--page-size", type=int, default=128)
    p.add_argument("--hbm-utilization", type=float, default=0.8)
    p.add_argument("--prefill-chunk", type=int, default=512)
    p.add_argument("--dp-size", type=int, default=1)
    p.add_argument("--tp-size", type=int, default=1)
    p.add_argument("--pp-size", type=int, default=1)
    p.add_argument("--quantization", type=str, default=None,
                   choices=["int8", "int4"])
    p.add_argument("--kv-cache-dtype", type=str, default="auto",
                   choices=["auto", "bf16", "int8", "fp8_e4m3"])
    p.add_argument("--enforce-eager", action="store_true")
    p.add_argument("--num-kv-pages", type=int, default=0)
    p.add_argument("--decode-lookahead", type=int, default=16)
    p.add_argument("--pipeline-depth", type=int, default=2)
    p.add_argument("--attention-backend", type=str, default="auto",
                   choices=["auto", "pallas", "xla"])
    # multi-host: run this command on EVERY host with the same
    # coordinator/num-hosts and a distinct --host-id; the HTTP server runs
    # on host 0, followers mirror the engine (parallel/multihost.py)
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--coordinator-address", type=str, default="")
    p.add_argument("--host-id", type=int, default=-1)
    return p


def config_from_args(args) -> EngineConfig:
    return EngineConfig(
        model=args.model,
        max_bs=args.max_bs,
        context_len=args.context_len,
        page_size=args.page_size,
        hbm_utilization=args.hbm_utilization,
        prefill_chunk=args.prefill_chunk,
        dp_size=args.dp_size,
        tp_size=args.tp_size,
        pp_size=args.pp_size,
        quantization=args.quantization,
        kv_cache_dtype=args.kv_cache_dtype,
        enforce_eager=args.enforce_eager,
        num_kv_pages=args.num_kv_pages,
        decode_lookahead=args.decode_lookahead,
        pipeline_depth=args.pipeline_depth,
        attention_backend=args.attention_backend,
        num_hosts=args.num_hosts,
        coordinator_address=args.coordinator_address,
        host_id=args.host_id,
        host=args.host,
        port=args.port,
    )


def main():
    args = make_arg_parser().parse_args()
    config = config_from_args(args)
    if config.num_hosts > 1:
        from nanovllmx_tpu.parallel import multihost

        hid, _ = multihost.initialize(config)
        if hid != 0:
            # follower host: no HTTP server — build the stack and mirror
            # the primary's engine until it broadcasts "stop"
            from nanovllmx_tpu.llm import LLM

            llm = LLM(config=config)
            llm._thread.join()
            return
    app = build_app(config)
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
