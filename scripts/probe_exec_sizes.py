"""Which executables carry the warm-replay bytes? Compile the fg set's
members one at a time into a scratch compilation cache and report the
per-step cache growth (the bytes a warm restart must push through the
relay to load each one)."""

import os
import sys

_DIR = "/tmp/probe_cache"
os.environ["MIOTTS_COMPILE_CACHE"] = _DIR  # honored by enable_compile_cache

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cache_bytes():
    return sum(os.path.getsize(os.path.join(_DIR, f))
               for f in os.listdir(_DIR))


def main():
    import shutil

    shutil.rmtree("/tmp/probe_cache", ignore_errors=True)
    os.makedirs("/tmp/probe_cache", exist_ok=True)
    from miotts_tpu.pipeline import MioTTSPipeline
    from miotts_tpu.serving.codec_batching import CodecMicroBatcher
    from miotts_tpu.streaming import StreamingSynthesizer

    pipe = MioTTSPipeline(os.environ.get("CODEC", "/tmp/miotts_bench_codec.gguf"))
    cb = CodecMicroBatcher(pipe, max_batch=8)
    last = cache_bytes()
    for bucket in (32, 128, 256):
        for label, kw in (
            ("full_pcm16", dict(pcm16=True)),
            ("stream_win", dict(interp_anchor=StreamingSynthesizer.INTERP_ANCHOR,
                                peak_normalize=False, pcm16=True,
                                wlen=StreamingSynthesizer.WINDOW_SAMPLES)),
            ("f32_fallback", dict(interp_anchor=StreamingSynthesizer.INTERP_ANCHOR,
                                  peak_normalize=False)),
        ):
            cb.warm(bucket, **kw)
            now = cache_bytes()
            print(f"codec bucket={bucket:4d} {label:12s} +{(now-last)/1e6:7.2f} MB",
                  flush=True)
            last = now

    from miotts_tpu.models.llm import LLMEngine
    from miotts_tpu.serving.batching import ContinuousBatcher

    # probe the FULL-WIDTH chunk executable (what the fg warm loads);
    # width-sliced variants would otherwise make the lone submit below
    # compile the width-1 executable under this label
    os.environ.setdefault("MIOTTS_CHUNK_SLICE", "0")

    eng = LLMEngine(os.environ.get("LLM", "/tmp/miotts_bench_llm_v2.gguf"))
    b = ContinuousBatcher(eng, n_lanes=8, max_ctx=700 + 120 + 64, chunk=32)
    for bucket in (32, 128):
        b.warm_prefill(bucket)
        now = cache_bytes()
        print(f"llm prefill bucket={bucket:4d} B=1     +{(now-last)/1e6:7.2f} MB",
              flush=True)
        last = now
    b.warm_prefill(32, n_lanes=8)
    now = cache_bytes()
    print(f"llm prefill bucket=  32 B=8     +{(now-last)/1e6:7.2f} MB", flush=True)
    last = now
    # the shared chunk-step executable (one real submit)
    from miotts_tpu.models.sampling import SamplerParams

    h = b.submit("warm", sampler=SamplerParams(), n_predict=14)
    for _ in h.tokens():
        pass
    now = cache_bytes()
    print(f"llm chunk/attach/fetch set      +{(now-last)/1e6:7.2f} MB", flush=True)
    b.shutdown()
    print(f"total {cache_bytes()/1e6:.1f} MB")


if __name__ == "__main__":
    main()
