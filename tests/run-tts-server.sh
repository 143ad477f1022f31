#!/usr/bin/env bash
# Launch the TTS server (mirror of the reference's tests/run-tts-server.sh).
set -euo pipefail

MODELS_DIR="${MODELS_DIR:-models}"
HOST="${HOST:-127.0.0.1}"
PORT="${PORT:-18089}"
PARALLEL="${PARALLEL:-4}"

exec python -m miotts_tpu.serving.server \
  -mv "${MODELS_DIR}/miocodec.gguf" \
  -m "${MODELS_DIR}/MioTTS-0.1B-Q8_0.gguf" \
  --tts-wavlm-model "${MODELS_DIR}/wavlm_base_plus_2layers.gguf" \
  --reference-file-json "[
    {\"key\":\"jp_female\",\"path\":\"${MODELS_DIR}/jp_female.emb.gguf\"},
    {\"key\":\"jp_male\",\"path\":\"${MODELS_DIR}/jp_male.emb.gguf\"},
    {\"key\":\"en_female\",\"path\":\"${MODELS_DIR}/en_female.emb.gguf\"},
    {\"key\":\"en_male\",\"path\":\"${MODELS_DIR}/en_male.emb.gguf\"}]" \
  --host "${HOST}" --port "${PORT}" -np "${PARALLEL}" "$@"
