import time, os, tempfile, numpy as np, jax, jax.numpy as jnp
from miotts_tpu.models.llm import LLMEngine, llm_start, llm_generate_chunk
from miotts_tpu.models.sampling import SamplerParams

tmp = tempfile.gettempdir()
eng = LLMEngine(os.path.join(tmp, "miotts_bench_llm.gguf"))
text = "hello world, this is a benchmark"
sp = SamplerParams(temp=0.8)

# warm start+chunk
t0 = time.perf_counter()
st = eng.start(text, n_ctx=700, sampler=sp) if hasattr(eng, 'start') else None
print("has start?", hasattr(eng, 'start'))
