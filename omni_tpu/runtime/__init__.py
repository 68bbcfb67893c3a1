from .kv_cache import KVCache, MAX_SEQS
from .sampler import SamplerParams, sample
from .context import Batch, Context

__all__ = ["KVCache", "MAX_SEQS", "SamplerParams", "sample", "Batch", "Context"]
