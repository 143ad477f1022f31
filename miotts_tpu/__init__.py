"""miotts_tpu — a TPU-native (JAX/XLA/Pallas) text-to-speech framework.

A from-scratch re-design of the capabilities of mio-tts-cpp (reference:
llama.cpp/GGML-based C++17 inference stack) for TPU hardware:

- the autoregressive codec-token LLM decode loop is a jitted ``lax.scan``
  over a batched KV cache with the full sampler chain in-graph,
- the MioCodec decoder / WavLM extractor are single jitted, length-bucketed
  forward functions with banded local attention,
- the iSTFT is an on-TPU DFT-matmul + overlap-add emitting waveforms directly,
- serving is a continuously-batched asyncio loop (batch lanes replace the
  reference's mutex-serialized worker slots).

Reference parity surface: ``src/mio-tts-lib.h`` (core C API),
``src/tts-mio-cli.cpp`` (CLI flags), ``src/tts-mio-server.cpp`` (/mio/* HTTP API).
"""

__version__ = "0.1.0"

MIO_CODE_MIN = 0
MIO_CODE_MAX = 12799  # reference: src/mio-tts-lib.cpp:30-31
MIO_EMBEDDING_TENSOR_NAME = "mio.global_embedding"  # src/mio-tts-lib.cpp:29
