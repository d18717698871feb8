#!/bin/bash
# Accuracy eval over the 11 think-mode benchmarks
# (reference eval/scripts/accuracy/run_all.sh: max_pixels=151200,
# min_pixels=100352, max_num_frames=128).
MODEL_CKPT=${MODEL_CKPT:-""}
OUTPUT=${OUTPUT:-"output/eval_think_128"}
DOCS_DIR=${DOCS_DIR:-"eval_docs"}   # per-task docs json: $DOCS_DIR/<task>.json

for task in mvbench videomme tempcompass tempcompass_complete mlvu \
            longvideobench videomathqa videommmu mmvu vsibench minerva \
            scivideobench; do
  python -m video_r2_tpu.apps.run_eval \
    --run.checkpoint "$MODEL_CKPT" \
    --run.output_dir "$OUTPUT/$task" \
    --tasks "${task}_think" \
    --docs "$DOCS_DIR/$task.json" \
    --eval.max_num_frames "${FPS_MAX_FRAMES:-128}" \
    --eval.batch_size "${EVAL_BATCH:-8}" \
    ${EVAL_EXTRA:-}
done
