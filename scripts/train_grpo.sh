#!/bin/bash
# GRPO launch — canonical Video-R2 hyperparameters (reference train/scripts/train_grpo.sh):
# 8 rollouts/prompt, beta 0.04, completions <=1024 tok, prompts <=32768 tok,
# 32 frames, fps 2.0, lr 1e-6, rewards accuracy+format+TAR (1,1,1),
# TAR buffer 2s / cosine threshold 0.75. Judge endpoint via OPENAI_API_BASE
# (serve one with: python -m video_r2_tpu.apps.serve --run.checkpoint <judge>).

MODEL_CKPT=${MODEL_CKPT:-""}
DATA_PATH=${DATA_PATH:-"grpo.json"}
VIDEO_FOLDER=${VIDEO_FOLDER:-"videos"}
OUTPUT=${OUTPUT:-"output/grpo"}
export OPENAI_API_BASE=${OPENAI_API_BASE:-"http://localhost:8000/v1"}
export SERVED_MODEL=${SERVED_MODEL:-"video-r2-tpu"}

python -m video_r2_tpu.apps.train_grpo \
  --run.checkpoint "$MODEL_CKPT" \
  --run.output_dir "$OUTPUT" \
  --run.max_steps "${MAX_STEPS:-500}" \
  --run.save_steps 500 \
  --data.data_path "$DATA_PATH" \
  --data.image_folder "$VIDEO_FOLDER" \
  --data.fps 2.0 \
  --data.fps_max_frames 32 \
  --optim.learning_rate 1e-6 \
  --grpo.num_generations 8 \
  --grpo.beta 0.04 \
  --grpo.max_completion_length 1024 \
  --grpo.max_prompt_length 32768 \
  --grpo.reward_weights 1,1,1 \
  --grpo.buffer_seconds 2 \
  --grpo.similarity_threshold 0.75
