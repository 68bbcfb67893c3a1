"""omni-tts: OuteTTS standalone text-to-speech driver.

Counterpart of the reference's llama-tts (tools/tts/tts.cpp): an OuteTTS
voice LLM (plain llama arch) generates audio codebook tokens from the
"<|im_start|>\\n<|text_start|>word<|text_sep|>...<|text_end|>\\n
<|audio_start|>\\n" prompt protocol; codes in the [151672, 155772] id
window (offset-stripped, tts.cpp:1003-1013) feed the WavTokenizer
decoder (models/wavtokenizer.py) whose spec head + inverse STFT produce
24 kHz audio. The first 0.25 s is zeroed like the reference (warmup
frames, tts.cpp:1076-1079)."""

from __future__ import annotations

import argparse
import re
import sys
import wave

import numpy as np

CODE_BASE = 151672  # first audio-code token id (tts.cpp:1003)
CODE_LAST = 155772
SAMPLE_RATE = 24000


def text_to_prompt_words(text: str) -> str:
    """Lowercased word list joined by <|text_sep|> (tts.cpp
    process_text: strip punctuation, collapse whitespace)."""
    text = re.sub(r"[-_/,\.\\]", " ", text.lower())
    words = [w for w in re.split(r"\s+", text) if w]
    return "<|text_sep|>".join(words)


def build_prompt(text: str) -> str:
    return ("<|im_start|>\n<|text_start|>" + text_to_prompt_words(text)
            + "<|text_end|>\n<|audio_start|>\n")


def generate_codes(ctx, tok, prompt: str, n_predict: int = 1024,
                   log=print) -> list[int]:
    """Run the voice LLM, return offset-stripped codebook tokens."""
    import jax.numpy as jnp

    from ..runtime import Batch

    audio_end = tok.vocab.token_to_id.get("<|audio_end|>")
    ids = tok.encode(prompt, add_special=True)
    toks: list[int] = []
    logits, _ = ctx.decode(Batch(tokens=np.asarray(ids, np.int32)))
    cur = int(jnp.argmax(logits[-1]))
    for _ in range(n_predict):
        toks.append(cur)
        if cur == audio_end or (tok.vocab.is_eog(cur)):
            break
        lg, _ = ctx.decode(Batch(tokens=np.asarray([cur], np.int32)))
        cur = int(jnp.argmax(lg[0]))
    codes = [t - CODE_BASE for t in toks if CODE_BASE <= t <= CODE_LAST]
    log(f"generated {len(toks)} tokens, {len(codes)} audio codes")
    return codes


def save_wav(path: str, audio: np.ndarray, rate: int = SAMPLE_RATE) -> None:
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype("<i2")
                      .tobytes())


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-m", "--model", required=True,
                    help="OuteTTS voice-LLM GGUF")
    ap.add_argument("-mv", "--vocoder", required=True,
                    help="WavTokenizer-dec GGUF")
    ap.add_argument("-p", "--prompt", required=True, help="text to speak")
    ap.add_argument("-o", "--out", default="output.wav")
    ap.add_argument("--n-predict", type=int, default=1024)
    ap.add_argument("--ctx", type=int, default=4096)
    args = ap.parse_args(argv)

    from ..core import GGUFReader
    from ..models import qwen3, wavtokenizer
    from ..runtime import Context, SamplerParams
    from ..tokenizer import build_tokenizer

    print(f"loading voice LLM: {args.model}")
    reader = GGUFReader(args.model)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                  qwen3.embed, n_ctx=args.ctx,
                  sampler=SamplerParams(greedy=True))
    tok = build_tokenizer(reader.kv)

    print(f"loading vocoder: {args.vocoder}")
    vreader = GGUFReader(args.vocoder)
    vcfg = wavtokenizer.WavTokConfig.from_gguf(vreader.kv)
    vparams = wavtokenizer.load_params(vreader, vcfg)

    prompt = build_prompt(args.prompt)
    codes = generate_codes(ctx, tok, prompt, n_predict=args.n_predict)
    if not codes:
        print("no audio codes generated", file=sys.stderr)
        return 1
    audio = wavtokenizer.decode_audio(vparams, vcfg, np.asarray(codes))
    audio[: SAMPLE_RATE // 4] = 0.0  # reference zeroes the warmup 0.25 s
    save_wav(args.out, audio)
    print(f"audio written to {args.out} "
          f"({len(audio) / SAMPLE_RATE:.2f}s @ {SAMPLE_RATE} Hz)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
