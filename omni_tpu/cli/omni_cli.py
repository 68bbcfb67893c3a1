"""omni-cli: the omni pipeline driver.

Counterpart of the reference omni-cli (/root/reference/tools/omni/
omni-cli.cpp): resolves the module GGUFs from the model directory layout
({dir}/{LLM}.gguf, {dir}/audio/*-audio-*.gguf, {dir}/vision/*-vision-*.gguf,
{dir}/tts/*-tts-*.gguf, token2wav GGUFs under {dir}/token2wav/), runs either
an interactive text chat or the `--test prefix N` AV test-case driver
(N wav/jpg rounds -> stream_prefill xN -> stream_decode), writing
round_XXX/tts_wav/wav_N.wav outputs.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time


def resolve_model_paths(llm_path: str) -> dict:
    base = os.path.dirname(os.path.abspath(llm_path))

    def find(sub, pat):
        hits = sorted(glob.glob(os.path.join(base, sub, pat)))
        return hits[0] if hits else None

    return {
        "llm": llm_path,
        "audio": find("audio", "*audio*.gguf"),
        "vision": find("vision", "*vision*.gguf"),
        "tts": find("tts", "*tts*.gguf"),
        "projector": find("tts", "*projector*.gguf"),
        "t2w_encoder": find("token2wav", "*encoder*.gguf"),
        "t2w_flow": find("token2wav", "*flow_matching*.gguf"),
        "t2w_extra": find("token2wav", "*flow_extra*.gguf"),
        "t2w_vocoder": find("token2wav", "*hifigan*.gguf"),
        "t2w_prompt": find("token2wav", "*prompt_cache*.gguf"),
    }


def build_pipeline(paths: dict, args):
    import jax.numpy as jnp
    import numpy as np

    from ..core import GGUFReader
    from ..models import qwen3
    from ..omni.pipeline import OmniPipeline, SessionConfig
    from ..runtime import Context, SamplerParams
    from ..tokenizer import build_tokenizer

    print(f"loading LLM: {paths['llm']}")
    reader = GGUFReader(paths["llm"])
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    llm = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=args.ctx_size,
                  sampler=SamplerParams(temp=args.temp, greedy=args.temp <= 0))
    tok = build_tokenizer(reader.kv)

    audio_encoder = None
    if paths.get("audio") and not args.no_audio:
        from ..models import whisper
        from ..omni import audio as audio_pre

        print(f"loading APM: {paths['audio']}")
        areader = GGUFReader(paths["audio"])
        acfg = whisper.WhisperConfig.from_gguf(areader.kv)
        aparams = whisper.load_params(areader)
        filters = whisper.mel_filters_from_gguf(areader.kv)
        astate = {"s": whisper.WhisperState.create(acfg)}

        def audio_encoder(wav):
            mel = audio_pre.log_mel_spectrogram(wav, filters)
            emb, astate["s"] = whisper.encode_chunk(aparams, acfg,
                                                    jnp.asarray(mel), astate["s"])
            # device-resident: the pipeline consumes jax arrays directly
            # (fetching here would cost a ~35 ms tunnel round-trip)
            return emb

    vision_encoder = None
    if paths.get("vision") and args.omni:
        from ..models import siglip
        from ..omni import image as image_pre

        print(f"loading VPM: {paths['vision']}")
        vreader = GGUFReader(paths["vision"])
        vcfg = siglip.SigLipConfig.from_gguf(vreader.kv)
        vparams = siglip.load_params(vreader)
        mean = list(vreader.kv.get("clip.vision.image_mean", [0.5] * 3))
        std = list(vreader.kv.get("clip.vision.image_std", [0.5] * 3))

        def vision_encoder(img, max_slice_nums=None):
            # runtime override (-1/None = load-time default): high_image
            # mode plumbs max_slice_nums=2 through SessionConfig
            msn = args.max_slice_nums
            if max_slice_nums is not None and max_slice_nums >= 0:
                msn = max_slice_nums
            parts = image_pre.preprocess_uhd(img, mean, std,
                                             max_slice_nums=msn)
            # per-part list [overview, slice1, ...]: the pipeline wraps each
            # in <image>/<slice> markers (omni.cpp:4329-4341)
            return [siglip.encode_image_np(vparams, vcfg, p) for p in parts]

    tts_ctx, tts_extras, t2w = None, None, None
    if paths.get("tts") and not args.no_tts:
        from ..models import tts as tts_mod

        print(f"loading TTS: {paths['tts']}")
        treader = GGUFReader(paths["tts"])
        tcfg = tts_mod.config_from_gguf(treader.kv)
        tparams, tts_extras = tts_mod.load_params(treader)
        tts_ctx = Context(tcfg, tparams, qwen3.forward, qwen3.embed,
                          n_ctx=args.ctx_size)
        if paths.get("t2w_encoder"):
            from ..models.token2wav import Token2Wav

            print("loading Token2Wav GGUFs")
            t2w = Token2Wav.from_gguf(
                paths["t2w_encoder"], paths["t2w_flow"], paths["t2w_extra"],
                paths["t2w_vocoder"], paths.get("t2w_prompt"))

    return OmniPipeline(
        llm=llm, tokenizer=tok, tts_ctx=tts_ctx, tts_extras=tts_extras,
        token2wav=t2w, audio_encoder=audio_encoder,
        vision_encoder=vision_encoder,
        config=SessionConfig(duplex=args.duplex,
                             use_tts=tts_ctx is not None,
                             media_type=2 if args.omni else 1),
    )


def run_test_cases(pipe, prefix: str, n_rounds: int, out_dir: str):
    """AV test-case driver (omni-cli.cpp:158-196 + generation_done.flag)."""
    import numpy as np

    from ..omni.audio import load_wav_mono_16k, write_wav

    pipe.stream_prefill(index=0, system_prompt="You are a helpful assistant.",
                        ref_audio=np.zeros(16000, np.float32))
    for i in range(1, n_rounds + 1):
        wav_path = f"{prefix}{i}.wav"
        jpg_path = f"{prefix}{i}.jpg"
        audio = load_wav_mono_16k(wav_path) if os.path.exists(wav_path) else None
        image = None
        if os.path.exists(jpg_path) and pipe.vision_encoder is not None:
            from ..omni.image import load_image

            image = load_image(jpg_path)
        print(f"[round {i}] prefill audio={'y' if audio is not None else 'n'} "
              f"image={'y' if image is not None else 'n'}")
        pipe.stream_prefill(audio=audio, image=image, index=i)

    round_dir = os.path.join(out_dir, "round_000", "tts_wav")
    os.makedirs(round_dir, exist_ok=True)
    t0 = time.time()
    pipe.stream_decode(round_idx=0)
    text, wav_idx = [], 0
    import queue as _q

    while True:
        try:
            ev = pipe.text_out.get(timeout=5.0)
        except _q.Empty:
            break
        if ev.get("content"):
            print(ev["content"], end="", flush=True)
            text.append(ev["content"])
        if ev.get("stop"):
            break
    while True:
        try:
            wave = pipe.wav_out.get(timeout=2.0)
        except _q.Empty:
            break
        write_wav(os.path.join(round_dir, f"wav_{wav_idx}.wav"), wave)
        wav_idx += 1
    open(os.path.join(out_dir, "round_000", "generation_done.flag"), "w").close()
    print(f"\n[done] {len(''.join(text))} chars, {wav_idx} wav chunks, "
          f"{time.time()-t0:.1f}s -> {round_dir}")


def run_chat(pipe):
    """Interactive text chat through the same session machinery."""
    import numpy as np
    import queue as _q

    pipe.stream_prefill(index=0, system_prompt="You are a helpful assistant.")
    print("omni-cli chat (empty line to exit)")
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            break
        pipe._eval_text(line)
        pipe.prefill_done.set()
        pipe.stream_decode()
        while True:
            try:
                ev = pipe.text_out.get(timeout=10.0)
            except _q.Empty:
                break
            if ev.get("content"):
                print(ev["content"], end="", flush=True)
            if ev.get("stop"):
                print()
                break


def main(argv=None):
    ap = argparse.ArgumentParser("omni-cli")
    ap.add_argument("-m", "--model", required=True, help="LLM GGUF path")
    ap.add_argument("--test", nargs=2, metavar=("PREFIX", "N"),
                    help="AV test-case driver: prefix + round count")
    ap.add_argument("--omni", action="store_true", help="enable vision")
    ap.add_argument("--duplex", action="store_true")
    ap.add_argument("--no-tts", action="store_true")
    ap.add_argument("--no-audio", action="store_true")
    ap.add_argument("-c", "--ctx-size", type=int, default=4096)
    ap.add_argument("--temp", type=float, default=0.7)
    ap.add_argument("--max-slice-nums", type=int, default=9)
    ap.add_argument("-o", "--output-dir", default="./omni_out")
    args = ap.parse_args(argv)

    paths = resolve_model_paths(args.model)
    pipe = build_pipeline(paths, args)
    try:
        if args.test:
            run_test_cases(pipe, args.test[0], int(args.test[1]),
                           args.output_dir)
        else:
            run_chat(pipe)
    finally:
        pipe.shutdown()


if __name__ == "__main__":
    main()
