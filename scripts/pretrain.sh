#!/bin/bash
# Stage 1 — projector alignment (reference scripts/v1_5/pretrain.sh recipe:
# lr 1e-3, global batch 256, 1 epoch, cosine+3% warmup, plain template).
# Parallelism comes from the in-process ('data','model') mesh; no launcher.
python -m tokenpacker_tpu.train.train \
    --stage pretrain \
    --version plain \
    --model-path "${MODEL_PATH:-lmsys/vicuna-7b-v1.5}" \
    --data-path "${DATA_PATH:-./playground/data/blip_laion_cc_sbu_558k.json}" \
    --image-folder "${IMAGE_FOLDER:-./playground/data/images}" \
    --scale-factor "${SCALE_FACTOR:-2}" \
    --learning-rate 1e-3 \
    --per-device-batch-size 32 \
    --gradient-accumulation-steps "${GRAD_ACCUM:-$(((256 / 32) / ${NUM_DEVICES:-8}))}" \
    --num-train-epochs 1 \
    --model-max-length 2048 \
    --save-steps 500 \
    --output-dir "${OUTPUT_DIR:-./checkpoints/tokenpacker-7b-pretrain}" \
    "$@"
