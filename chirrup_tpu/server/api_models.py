"""Pydantic request/response models — OpenAI-compatible surface plus the
batch translate/rollout extensions (field-compatible with the reference
/root/reference/chirrup/web_service/api_model.py)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

from pydantic import BaseModel, Field

from chirrup_tpu.engine.structures import (
    DEFAULT_SAMPLING_CONFIG, DEFAULT_STOP_TOKENS)


class ChatMessage(BaseModel):
    role: str = Field(..., description="'user' | 'assistant' | 'system'")
    content: str = Field(..., description="message text")
    reasoning_content: Optional[str] = None


class ChatCompletionRequest(BaseModel):
    model: str = Field(default="rwkv-latest")
    messages: List[ChatMessage]
    stream: bool = False

    temperature: float = Field(default=DEFAULT_SAMPLING_CONFIG["temperature"],
                               ge=0.0, le=2.0)
    top_p: float = Field(default=DEFAULT_SAMPLING_CONFIG["top_p"], ge=0.0, le=1.0)
    presence_penalty: float = Field(
        default=DEFAULT_SAMPLING_CONFIG["presence_penalty"], ge=0, le=2.0)
    frequency_penalty: float = Field(
        default=DEFAULT_SAMPLING_CONFIG["frequency_penalty"], ge=0, le=2.0)
    penalty_decay: float = Field(default=DEFAULT_SAMPLING_CONFIG["penalty_decay"],
                                 ge=0.0, le=1.0)
    max_tokens: int = Field(default=DEFAULT_SAMPLING_CONFIG["max_tokens"], ge=1)
    stop: Optional[Union[str, List[str]]] = None
    ignore_eos: bool = Field(
        default=False,
        description="disable ALL stop tokens (incl. defaults) so generation "
                    "always runs to max_tokens — the vLLM benchmarking extra")

    pad_zero: bool = Field(default=True, description="prepend token 0 to the prompt")
    use_state_cache: bool = True
    cache_prefill: bool = True


class ChatCompletionResponseChoice(BaseModel):
    index: int
    message: ChatMessage
    finish_reason: str


class ChatCompletionResponseUsage(BaseModel):
    prompt_tokens: int
    completion_tokens: int
    total_tokens: int


class ChatCompletionResponse(BaseModel):
    id: str
    object: str = "chat.completion"
    created: int
    model: str
    choices: List[ChatCompletionResponseChoice]
    usage: ChatCompletionResponseUsage


class ChatCompletionStreamChoice(BaseModel):
    index: int
    delta: Dict[str, Any]
    finish_reason: Optional[str] = None


class ChatCompletionStreamResponse(BaseModel):
    id: str
    object: str = "chat.completion.chunk"
    created: int
    model: str
    choices: List[ChatCompletionStreamChoice]
    # present only on the TERMINAL frame (finish_reason set): server-counted
    # token totals, like OpenAI's stream_options usage chunk. Clients should
    # count tokens from this, not from frame counts — think-tag routing
    # merges token runs, so frames undercount tokens ~1.2x
    usage: Optional[ChatCompletionResponseUsage] = None


class ModelInfo(BaseModel):
    id: str
    object: str = "model"
    created: int
    owned_by: str


class ModelsResponse(BaseModel):
    object: str = "list"
    data: List[ModelInfo]


class ErrorResponse(BaseModel):
    error: Dict[str, Any]


class TranslateRequest(BaseModel):
    source_lang: str = "auto"
    target_lang: str
    text_list: List[str]
    placeholders: Optional[List[str]] = None


class TranslationResult(BaseModel):
    text: str
    detected_source_lang: str


class TranslateResponse(BaseModel):
    translations: List[TranslationResult]
    id: str
    created: int


class RolloutRequest(BaseModel):
    model: str = Field(default="rwkv-latest")
    contents: List[str]
    stream: bool = False

    temperature: float = Field(default=DEFAULT_SAMPLING_CONFIG["temperature"],
                               ge=0.0, le=2.0)
    top_p: float = Field(default=DEFAULT_SAMPLING_CONFIG["top_p"], ge=0.0, le=1.0)
    presence_penalty: float = Field(
        default=DEFAULT_SAMPLING_CONFIG["presence_penalty"], ge=0, le=2.0)
    frequency_penalty: float = Field(
        default=DEFAULT_SAMPLING_CONFIG["frequency_penalty"], ge=0, le=2.0)
    penalty_decay: float = Field(default=DEFAULT_SAMPLING_CONFIG["penalty_decay"],
                                 ge=0.0, le=1.0)
    max_tokens: int = Field(default=DEFAULT_SAMPLING_CONFIG["max_tokens"], ge=1)
    stop_tokens: List[int] = Field(default=list(DEFAULT_STOP_TOKENS))
    pad_zero: bool = True


class RolloutStreamChoice(BaseModel):
    index: int
    delta: Dict[str, Any]


class RolloutStreamResponse(BaseModel):
    id: str
    object: str = "batch.rollout.chunk"
    created: int
    model: str = "rwkv-latest"
    choices: List[RolloutStreamChoice] = []
    rollouts: Optional[List[RolloutStreamChoice]] = None
