"""Serving logic for /v1/completions and /v1/chat/completions.

Counterpart of the reference's `serving_engine.py` / `serving_chat.py` /
`serving_completion.py`: map HTTP params to SamplingParams, stream SSE chunks
or collect a full response, validate unsupported fields. Unlike the reference
(which rejects `stop` and duplicates one completion for n>1,
`serving_chat.py:23-30,60-67`), stop strings are enforced via the
incremental detokenizer and n>1 runs n independent generations.
"""

from __future__ import annotations

import asyncio
import json
import uuid

from nanovllmx_tpu.llm import LLM
from nanovllmx_tpu.sampling_params import SamplingParams
from nanovllmx_tpu.server import protocol as P


def _sampling_params(req, max_tokens_field=None) -> SamplingParams:
    """HTTP params -> SamplingParams (ref `serving_engine.py:43-61`)."""
    stop = req.stop
    if isinstance(stop, str):
        stop = [stop]
    return SamplingParams(
        temperature=req.temperature,
        top_p=req.top_p,
        top_k=getattr(req, "top_k", -1),
        min_p=getattr(req, "min_p", 0.0),
        max_new_tokens=max_tokens_field,
        stop=stop,
        ignore_eos=getattr(req, "ignore_eos", False),
    )


def _usage(out) -> P.UsageInfo:
    return P.UsageInfo(
        prompt_tokens=out.num_prompt_tokens,
        completion_tokens=out.num_generated_tokens,
        total_tokens=out.num_prompt_tokens + out.num_generated_tokens,
    )


class OpenAIServing:
    def __init__(self, llm: LLM, model_name: str):
        self.llm = llm
        self.model_name = model_name

    def validate_completion(self, req: P.CompletionRequest) -> str | None:
        if req.echo:
            return "echo is not supported"
        if req.suffix is not None:
            return "suffix is not supported"
        if req.logprobs is not None:
            return "logprobs is not supported"
        if req.best_of is not None:
            return "best_of is not supported"
        if isinstance(req.prompt, list) and req.prompt and isinstance(
            req.prompt[0], (list, str)
        ):
            return "batched prompts are not supported; send one prompt"
        return None

    def validate_chat(self, req: P.ChatCompletionRequest) -> str | None:
        if req.logit_bias:
            return "logit_bias is not supported"
        if req.presence_penalty or req.frequency_penalty:
            return "penalties are not supported"
        for m in req.messages:
            if not isinstance(m.content, (str, type(None))):
                return "only string message content is supported"
        return None

    # ------------------------------------------------------------ completions

    async def create_completion(self, req: P.CompletionRequest):
        params = _sampling_params(req, req.max_tokens)
        prompt = req.prompt
        n = max(1, req.n)
        if req.stream:
            return self.completion_stream(req, prompt, params, n)
        # n>1 samples run CONCURRENTLY (they continuous-batch in the engine;
        # the reference duplicates one completion instead, serving_chat.py:60-67)
        outs = await self._generate_all(prompt, params, n)
        choices = [
            P.CompletionChoice(index=i, text=o.text,
                               finish_reason=o.finish_reason)
            for i, o in enumerate(outs)
        ]
        usage = P.UsageInfo(
            prompt_tokens=outs[0].num_prompt_tokens,
            completion_tokens=sum(o.num_generated_tokens for o in outs),
        )
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        return P.CompletionResponse(
            model=self.model_name, choices=choices, usage=usage
        )

    async def _generate_all(self, prompt, params, n: int):
        """n concurrent generate_full calls; on any failure the surviving
        siblings are CANCELLED (cancellation aborts their engine sequences
        via LLM.generate's CancelledError path) instead of running detached
        to completion while the handler returns an error (ADVICE r02)."""
        tasks = [
            asyncio.ensure_future(self.llm.generate_full(prompt, params))
            for _ in range(n)
        ]
        try:
            return await asyncio.gather(*tasks)
        except BaseException:
            for t in tasks:
                t.cancel()
            await asyncio.gather(*tasks, return_exceptions=True)
            raise

    async def _merge_streams(self, prompt, params, n: int):
        """Run n generations concurrently, yielding (index, GenerateOutput)
        in arrival order (OpenAI streaming labels chunks by choice index).

        A pump failure (e.g. engine-thread crash) is re-raised here — NOT
        swallowed into a normal end-of-stream (ADVICE r02): the consumer
        turns it into an SSE error event and the remaining pumps are
        cancelled (aborting their engine sequences)."""
        q: asyncio.Queue = asyncio.Queue()

        async def pump(i: int):
            try:
                async for out in self.llm.generate(prompt, params):
                    q.put_nowait((i, out))
                q.put_nowait((i, None))
            except asyncio.CancelledError:
                q.put_nowait((i, None))
                raise
            except BaseException as e:  # noqa: BLE001 — surfaced to client
                q.put_nowait((i, e))

        tasks = [asyncio.ensure_future(pump(i)) for i in range(n)]
        live = n
        try:
            while live:
                i, out = await q.get()
                if out is None:
                    live -= 1
                    continue
                if isinstance(out, BaseException):
                    raise out
                yield i, out
        finally:
            for t in tasks:
                t.cancel()
            # retrieve every task's outcome so no exception goes unobserved
            await asyncio.gather(*tasks, return_exceptions=True)

    @staticmethod
    def _sse_error(exc: BaseException) -> str:
        """Terminal SSE error event (stream ends abnormally: no [DONE])."""
        err = P.ErrorResponse(message=str(exc) or type(exc).__name__,
                              code=500)
        return f"data: {json.dumps({'error': err.model_dump()})}\n\n"

    async def completion_stream(self, req, prompt, params, n: int = 1):
        rid = f"cmpl-{uuid.uuid4().hex}"
        lasts: dict[int, object] = {}
        try:
            async for i, out in self._merge_streams(prompt, params, n):
                lasts[i] = out
                chunk = P.CompletionStreamResponse(
                    id=rid, model=self.model_name,
                    choices=[P.CompletionStreamChoice(
                        index=i, text=out.text,
                        finish_reason=(
                            out.finish_reason if out.finished else None
                        ),
                    )],
                )
                yield f"data: {chunk.model_dump_json(exclude_none=True)}\n\n"
        except asyncio.CancelledError:
            raise
        except BaseException as e:  # noqa: BLE001 — surfaced as SSE error
            yield self._sse_error(e)
            return
        if lasts:
            outs = list(lasts.values())
            usage = P.UsageInfo(
                prompt_tokens=outs[0].num_prompt_tokens,
                completion_tokens=sum(o.num_generated_tokens for o in outs),
            )
            usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
            final = P.CompletionStreamResponse(
                id=rid, model=self.model_name, choices=[], usage=usage
            )
            yield f"data: {final.model_dump_json(exclude_none=True)}\n\n"
        yield "data: [DONE]\n\n"

    # ------------------------------------------------------------------- chat

    def _chat_prompt(self, req: P.ChatCompletionRequest) -> list[int]:
        """Apply the tokenizer chat template (ref `serving_chat.py:36-39`)."""
        messages = [m.model_dump(exclude_none=True) for m in req.messages]
        return self.llm.tokenizer.apply_chat_template(
            messages, tokenize=True, add_generation_prompt=True
        )

    async def create_chat_completion(self, req: P.ChatCompletionRequest):
        params = _sampling_params(
            req, req.max_completion_tokens or req.max_tokens
        )
        prompt_ids = self._chat_prompt(req)
        n = max(1, req.n)
        if req.stream:
            return self.chat_stream(req, prompt_ids, params, n)
        outs = await self._generate_all(prompt_ids, params, n)
        choices = [
            P.ChatChoice(
                index=i,
                message=P.ChatMessage(role="assistant", content=o.text),
                finish_reason=o.finish_reason,
            )
            for i, o in enumerate(outs)
        ]
        usage = P.UsageInfo(
            prompt_tokens=outs[0].num_prompt_tokens,
            completion_tokens=sum(o.num_generated_tokens for o in outs),
        )
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        return P.ChatCompletionResponse(
            model=self.model_name, choices=choices, usage=usage
        )

    async def chat_stream(self, req, prompt_ids, params, n: int = 1):
        rid = f"chatcmpl-{uuid.uuid4().hex}"
        for i in range(n):
            first = P.ChatCompletionStreamResponse(
                id=rid, model=self.model_name,
                choices=[P.ChatStreamChoice(
                    index=i, delta=P.DeltaMessage(role="assistant"))],
            )
            yield f"data: {first.model_dump_json(exclude_none=True)}\n\n"
        lasts: dict[int, object] = {}
        try:
            async for i, out in self._merge_streams(prompt_ids, params, n):
                lasts[i] = out
                chunk = P.ChatCompletionStreamResponse(
                    id=rid, model=self.model_name,
                    choices=[P.ChatStreamChoice(
                        index=i, delta=P.DeltaMessage(content=out.text),
                        finish_reason=(
                            out.finish_reason if out.finished else None
                        ),
                    )],
                )
                yield f"data: {chunk.model_dump_json(exclude_none=True)}\n\n"
        except asyncio.CancelledError:
            raise
        except BaseException as e:  # noqa: BLE001 — surfaced as SSE error
            yield self._sse_error(e)
            return
        if lasts:
            outs = list(lasts.values())
            usage = P.UsageInfo(
                prompt_tokens=outs[0].num_prompt_tokens,
                completion_tokens=sum(o.num_generated_tokens for o in outs),
            )
            usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
            final = P.ChatCompletionStreamResponse(
                id=rid, model=self.model_name, choices=[], usage=usage
            )
            yield f"data: {final.model_dump_json(exclude_none=True)}\n\n"
        yield "data: [DONE]\n\n"
