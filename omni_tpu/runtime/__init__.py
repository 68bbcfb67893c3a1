from .kv_cache import KVCache, MAX_SEQS
from .sampler import SamplerParams, sample
from .context import Batch, Context, KVCacheFull
from .speculative import SpecParams, SpecStats, speculative_generate

__all__ = ["KVCache", "MAX_SEQS", "SamplerParams", "sample", "Batch",
           "Context", "KVCacheFull", "SpecParams", "SpecStats",
           "speculative_generate"]
