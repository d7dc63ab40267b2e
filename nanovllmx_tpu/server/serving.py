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
        if req.stream:
            return self.completion_stream(req, prompt, params)
        choices = []
        usage = P.UsageInfo()
        for i in range(max(1, req.n)):
            out = await self.llm.generate_full(prompt, params)
            choices.append(P.CompletionChoice(
                index=i, text=out.text, finish_reason=out.finish_reason,
            ))
            u = _usage(out)
            usage.prompt_tokens = u.prompt_tokens
            usage.completion_tokens += u.completion_tokens
            usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        return P.CompletionResponse(
            model=self.model_name, choices=choices, usage=usage
        )

    async def completion_stream(self, req, prompt, params):
        rid = f"cmpl-{uuid.uuid4().hex}"
        last = None
        async for out in self.llm.generate(prompt, params):
            last = out
            chunk = P.CompletionStreamResponse(
                id=rid, model=self.model_name,
                choices=[P.CompletionStreamChoice(
                    text=out.text,
                    finish_reason=out.finish_reason if out.finished else None,
                )],
            )
            yield f"data: {chunk.model_dump_json(exclude_none=True)}\n\n"
        if last is not None:
            final = P.CompletionStreamResponse(
                id=rid, model=self.model_name, choices=[], usage=_usage(last)
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
        if req.stream:
            return self.chat_stream(req, prompt_ids, params)
        choices = []
        usage = P.UsageInfo()
        for i in range(max(1, req.n)):
            out = await self.llm.generate_full(prompt_ids, params)
            choices.append(P.ChatChoice(
                index=i,
                message=P.ChatMessage(role="assistant", content=out.text),
                finish_reason=out.finish_reason,
            ))
            u = _usage(out)
            usage.prompt_tokens = u.prompt_tokens
            usage.completion_tokens += u.completion_tokens
            usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        return P.ChatCompletionResponse(
            model=self.model_name, choices=choices, usage=usage
        )

    async def chat_stream(self, req, prompt_ids, params):
        rid = f"chatcmpl-{uuid.uuid4().hex}"
        first = P.ChatCompletionStreamResponse(
            id=rid, model=self.model_name,
            choices=[P.ChatStreamChoice(delta=P.DeltaMessage(role="assistant"))],
        )
        yield f"data: {first.model_dump_json(exclude_none=True)}\n\n"
        last = None
        async for out in self.llm.generate(prompt_ids, params):
            last = out
            chunk = P.ChatCompletionStreamResponse(
                id=rid, model=self.model_name,
                choices=[P.ChatStreamChoice(
                    delta=P.DeltaMessage(content=out.text),
                    finish_reason=out.finish_reason if out.finished else None,
                )],
            )
            yield f"data: {chunk.model_dump_json(exclude_none=True)}\n\n"
        if last is not None:
            final = P.ChatCompletionStreamResponse(
                id=rid, model=self.model_name, choices=[], usage=_usage(last)
            )
            yield f"data: {final.model_dump_json(exclude_none=True)}\n\n"
        yield "data: [DONE]\n\n"
