#!/bin/bash
python run_infer_wsi.py \
    --batch_size=25 \
    --model="model/" \
    --input_dir="input/" \
    --msk_dir="mask/" \
    --output_dir="output/" \
    --cache_path="cache/" \
    --save_thumb
