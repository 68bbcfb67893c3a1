from .vocab import Vocab, build_tokenizer

__all__ = ["Vocab", "build_tokenizer"]
