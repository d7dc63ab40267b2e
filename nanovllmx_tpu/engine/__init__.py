from nanovllmx_tpu.engine.engine import Engine
from nanovllmx_tpu.engine.kv_manager import KVCacheManager
from nanovllmx_tpu.engine.page_allocator import PageAllocator
from nanovllmx_tpu.engine.radix_tree import RadixTree
from nanovllmx_tpu.engine.scheduler import Scheduler
from nanovllmx_tpu.engine.sequence import (
    EngineOutput,
    FinishReason,
    ForwardBatch,
    ForwardMode,
    GenerateOutput,
    ScheduledSeq,
    Sequence,
    SequenceStatus,
)

__all__ = [
    "Engine",
    "KVCacheManager",
    "PageAllocator",
    "RadixTree",
    "Scheduler",
    "EngineOutput",
    "FinishReason",
    "ForwardBatch",
    "ForwardMode",
    "GenerateOutput",
    "ScheduledSeq",
    "Sequence",
    "SequenceStatus",
]
