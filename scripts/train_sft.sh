#!/bin/bash
# SFT launch — canonical Video-R2 hyperparameters (reference train/scripts/train_sft.sh):
# global batch 32, LoRA r64 a64, frozen vision/merger per flags, lr 1e-5
# (merger 1e-5, vision 2e-6), cosine + 3% warmup, 128-frame budget, fps 1.0,
# video_max_pixels 360*420, timestamp+subtitle burn-in ON.
# One process per host (jax.distributed replaces torchrun).

MODEL_CKPT=${MODEL_CKPT:-""}          # HF Qwen2.5-VL-7B-Instruct dir
DATA_PATH=${DATA_PATH:-"train.json"}
VIDEO_FOLDER=${VIDEO_FOLDER:-"videos"}
OUTPUT=${OUTPUT:-"output/sft"}

python -m video_r2_tpu.apps.train_sft \
  --run.checkpoint "$MODEL_CKPT" \
  --run.output_dir "$OUTPUT" \
  --run.fsdp "${FSDP:-8}" \
  --run.max_steps "${MAX_STEPS:-1000}" \
  --run.save_steps 500 \
  --data.data_path "$DATA_PATH" \
  --data.image_folder "$VIDEO_FOLDER" \
  --data.fps 1.0 \
  --data.fps_max_frames 128 \
  --data.video_max_pixels $((360*420)) \
  --data.write_timestamps true \
  --data.write_subtitles true \
  --optim.learning_rate 1e-5 \
  --optim.merger_lr 1e-5 \
  --optim.vision_lr 2e-6 \
  --optim.warmup_ratio 0.03 \
  --optim.freeze_vision true \
  --optim.freeze_merger true \
  --run.use_lora "${USE_LORA:-true}" \
  --lora.r 64 \
  --lora.alpha 64
