#!/usr/bin/env bash
# Download MioTTS model assets from Hugging Face (mmnga-o/miotts-cpp-gguf),
# mirroring the reference's models_download.sh. The GGUF files are loaded
# directly by this framework (same tensor contract; Q8_0 LLM is dequantized
# to bf16 on load).
set -euo pipefail

REPO="${MIOTTS_HF_REPO:-mmnga-o/miotts-cpp-gguf}"
BASE_URL="https://huggingface.co/${REPO}/resolve/main"
OUT_DIR="${1:-models}"

mkdir -p "${OUT_DIR}"

FILES=(
  "MioTTS-0.1B-Q8_0.gguf"
  "miocodec.gguf"
  "miocodec-44100hz.gguf"
  "wavlm_base_plus_2layers.gguf"
  "jp_female.emb.gguf"
  "jp_male.emb.gguf"
  "en_female.emb.gguf"
  "en_male.emb.gguf"
)

for f in "${FILES[@]}"; do
  dst="${OUT_DIR}/${f}"
  if [[ -s "${dst}" ]]; then
    echo "skip ${f} (exists)"
    continue
  fi
  echo "downloading ${f}..."
  if command -v curl >/dev/null 2>&1; then
    curl -L --fail -o "${dst}" "${BASE_URL}/${f}" || echo "warn: failed ${f}"
  else
    wget -O "${dst}" "${BASE_URL}/${f}" || echo "warn: failed ${f}"
  fi
done

echo "done. models in ${OUT_DIR}/"
