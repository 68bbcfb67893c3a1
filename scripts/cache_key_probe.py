"""Diagnose persistent-compile-cache key instability (PERF.md OPEN item).

Wraps jax._src.cache_key.get to record, for every key computation:
module name, final key, and per-component digests (computation bytes,
compile_options bytes, backend version, XLA flags, accelerator config),
dumping the raw serialized compile options + canonical IR to files so a
second run can be diffed field-by-field.

Usage:
    python scripts/cache_key_probe.py /tmp/probe_run1 [--bench|--small]
Then run again into /tmp/probe_run2 and diff:
    python scripts/cache_key_probe.py --diff /tmp/probe_run1 /tmp/probe_run2
"""

import hashlib
import io
import json
import os
import sys


def install(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    import jax._src.cache_key as ck

    orig_get = ck.get
    counter = {}

    def probed_get(module, devices, compile_options, backend,
                   compression_algorithm="zstandard", ignore_callbacks=None):
        kwargs = {}
        if ignore_callbacks is not None:
            kwargs["ignore_callbacks"] = ignore_callbacks
        key = orig_get(module, devices, compile_options, backend,
                       compression_algorithm, **kwargs)
        try:
            name = str(module.operation.attributes["sym_name"]).strip('"')
        except Exception:  # noqa: BLE001
            name = "unknown"
        n = counter.get(name, 0)
        counter[name] = n + 1
        tag = f"{name}.{n}"

        comps = {}
        # computation bytes — exactly what _hash_computation hashes
        # (canonicalized IR: strip-debuginfo + bytecode)
        try:
            ir_bytes = ck._canonicalize_ir(module, ck.IgnoreCallbacks.NO)
            comps["computation"] = hashlib.sha256(ir_bytes).hexdigest()[:16]
            with open(os.path.join(out_dir, tag + ".ir"), "wb") as f:
                f.write(ir_bytes)
            # also dump the textual IR for diffing
            with open(os.path.join(out_dir, tag + ".mlir"), "w") as f:
                f.write(str(module))
        except Exception as e:  # noqa: BLE001
            comps["computation"] = f"err:{e}"
        # serialized compile options (post scrub, as the key hashes them)
        try:
            import copy
            h = hashlib.sha256()
            ck._hash_serialized_compile_options(
                h, compile_options,
                strip_device_assignment=(backend.platform == "gpu"))
            comps["compile_options"] = h.hexdigest()[:16]
            co = copy.deepcopy(compile_options)
            with open(os.path.join(out_dir, tag + ".copts"), "wb") as f:
                f.write(co.SerializeAsString())
        except Exception as e:  # noqa: BLE001
            comps["compile_options"] = f"err:{e}"
        for cname, fn in (
                ("backend", lambda h: ck._hash_platform(h, backend)),
                ("xla_flags", lambda h: ck._hash_xla_flags(
                    h, ck.get_flag_prefixes())),
                ("accel_config", lambda h: ck._hash_accelerator_config(
                    h, devices))):
            try:
                h = hashlib.sha256()
                fn(h)
                comps[cname] = h.hexdigest()[:16]
            except Exception as e:  # noqa: BLE001
                comps[cname] = f"err:{e}"
        with open(os.path.join(out_dir, "keys.jsonl"), "a") as f:
            f.write(json.dumps({"tag": tag, "key": key[:24],
                                "comps": comps}) + "\n")
        return key

    ck.get = probed_get
    # the compiler module binds cache_key.get at import in some versions
    try:
        import jax._src.compiler as comp

        if hasattr(comp, "cache_key"):
            comp.cache_key.get = probed_get
    except Exception:  # noqa: BLE001
        pass


def diff(dir_a: str, dir_b: str) -> None:
    def load(d):
        out = {}
        with open(os.path.join(d, "keys.jsonl")) as f:
            for line in f:
                r = json.loads(line)
                out[r["tag"]] = r
        return out

    a, b = load(dir_a), load(dir_b)
    stable = unstable = 0
    for tag in sorted(set(a) & set(b)):
        ra, rb = a[tag], b[tag]
        if ra["key"] == rb["key"]:
            stable += 1
            continue
        unstable += 1
        bad = [c for c in ra["comps"]
               if ra["comps"][c] != rb["comps"].get(c)]
        print(f"UNSTABLE {tag}: differing components: {bad}")
        for c in bad:
            print(f"    {c}: {ra['comps'][c]} vs {rb['comps'][c]}")
    only_a = set(a) - set(b)
    only_b = set(b) - set(a)
    if only_a:
        print(f"only in A: {sorted(only_a)[:10]}")
    if only_b:
        print(f"only in B: {sorted(only_b)[:10]}")
    print(f"{stable} stable / {unstable} unstable "
          f"(A={len(a)}, B={len(b)} keys)")


def main():
    if sys.argv[1] == "--diff":
        diff(sys.argv[2], sys.argv[3])
        return
    out_dir = sys.argv[1]
    install(out_dir)
    sys.argv = [sys.argv[0]]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if "--small" in sys.argv or os.environ.get("OMNI_PROBE_SMALL"):
        _small_repro()
    else:
        import bench

        bench.main()


def _small_repro():
    """Small-model version of the bench's module sequence: Context
    bucket steps + the fused omni decode scan, via the same pipeline."""
    import numpy as np

    from omni_tpu.models import qwen3
    from omni_tpu.omni.pipeline import OmniPipeline, SessionConfig
    from omni_tpu.runtime import Context, SamplerParams
    from omni_tpu.testing_synth import synth_qwen3_params

    cfg = qwen3.Qwen3Config(
        n_layers=2, d_model=256, n_heads=4, n_kv_heads=2, head_dim=64,
        d_ff=512, n_vocab=1024)
    params = synth_qwen3_params(cfg, fuse=True)
    llm = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=512,
                  sampler=SamplerParams(greedy=True))

    import bench

    pipe = OmniPipeline(
        llm=llm, tokenizer=bench._BenchTokenizer(),
        config=SessionConfig(duplex=False, use_tts=False,
                             max_preserved_context=512))
    pipe.stream_prefill(index=0, system_prompt="HELLO WORLD " * 4)
    pipe.stream_decode(round_idx=0, max_new_tokens=16)
    pipe.warm_decode()
    pipe.stream_decode(round_idx=1, max_new_tokens=16)
    print("small repro done")


if __name__ == "__main__":
    main()
