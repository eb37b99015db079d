#!/usr/bin/env bash
# Launcher mirroring the reference's launch_inference.sh (same knobs).
set -euo pipefail

MODEL_PATH="${MODEL_PATH:-$HOME/checkpoints/paligemma-3b-pt-224}"
PROMPT="${PROMPT:-Answer in English: -> This building is }"
IMAGE_FILE_PATH="${IMAGE_FILE_PATH:-test_images/pic1.png}"
MAX_TOKENS_TO_GENERATE="${MAX_TOKENS_TO_GENERATE:-1000}"
TEMPERATURE="${TEMPERATURE:-0.8}"
TOP_P="${TOP_P:-0.9}"
DO_SAMPLE="${DO_SAMPLE:-false}"
ONLY_CPU="${ONLY_CPU:-false}"

ARGS=(
  --model_path "$MODEL_PATH"
  --prompt "$PROMPT"
  --image_file_path "$IMAGE_FILE_PATH"
  --max_tokens_to_generate "$MAX_TOKENS_TO_GENERATE"
  --temperature "$TEMPERATURE"
  --top_p "$TOP_P"
)
[ "$DO_SAMPLE" = "true" ] && ARGS+=(--do_sample)
[ "$ONLY_CPU" = "true" ] && ARGS+=(--only_cpu)

exec python -m paligemma_tpu.cli.infer "${ARGS[@]}"
