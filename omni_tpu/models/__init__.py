from . import qwen3

__all__ = ["qwen3"]
