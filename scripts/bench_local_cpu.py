"""Local CPU text->speech measurement (the reference's laptop/llama.cpp
story): native int8 LLM decode + XLA-CPU codec synthesis, steady-state.

Usage:
  MIOTTS_PLATFORM=cpu python scripts/bench_local_cpu.py \
      [llm_q8.gguf] [codec.gguf] [n_predict=100]
Defaults to the bench GGUFs in $TMPDIR.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    os.environ.setdefault("MIOTTS_PLATFORM", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from miotts_tpu.models.llm_cpu import NativeCpuLLMEngine
    from miotts_tpu.models.sampling import SamplerParams
    from miotts_tpu.pipeline import MioTTSPipeline

    tmp = tempfile.gettempdir()
    llm_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        tmp, "miotts_bench_llm_q8.gguf")
    codec_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        tmp, "miotts_bench_codec.gguf")
    n_predict = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    t0 = time.perf_counter()
    llm = NativeCpuLLMEngine(llm_path)
    print(f"llm load: {time.perf_counter() - t0:.1f}s "
          f"(quant={llm.quantize})", flush=True)
    t0 = time.perf_counter()
    pipe = MioTTSPipeline(codec_path)
    print(f"codec load: {time.perf_counter() - t0:.1f}s", flush=True)
    rng = np.random.RandomState(0)
    emb = rng.randn(pipe.config.decoder_adanorm_dim).astype(np.float32)
    sp = SamplerParams(temp=0.8, top_k=50, seed=1)
    spt, sr = pipe.samples_per_token, pipe.sample_rate

    for run in ("cold", "warm", "warm2"):
        t0 = time.perf_counter()
        toks = llm.generate_audio_tokens(
            "A local real time text to speech demonstration sentence.",
            n_predict=n_predict, sampler=sp)
        dt_llm = time.perf_counter() - t0
        codes = llm.tokens_to_codes(toks)
        t0 = time.perf_counter()
        result = pipe.synthesize(codes, emb)
        dt_codec = time.perf_counter() - t0
        audio_sec = result.audio.size / sr
        total = dt_llm + dt_codec
        print(f"{run}: llm {len(toks)} tok in {dt_llm:.2f}s "
              f"({len(toks) / dt_llm:.1f} tok/s, RT needs {sr / spt:.0f}) | "
              f"codec {audio_sec:.1f}s audio in {dt_codec:.2f}s "
              f"({audio_sec / dt_codec:.1f}x RT) | "
              f"end-to-end {audio_sec / total:.2f}x RT", flush=True)


if __name__ == "__main__":
    main()
