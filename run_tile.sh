#!/bin/bash
python run_infer_tile.py \
    --batch_size=25 \
    --model="model/" \
    --input_dir="input/" \
    --output_dir="output/"
