#!/bin/bash
# DLRM on Avazu — reference bench/avazu.sh: dim 16, lr 0.1, batch 128.

dlrm_extra_option=${1:-}
DATA=${DATA:-datasets/avazu}

python main.py \
  --dataset avazu \
  --data_path "$DATA" \
  --embedding_dim 16 \
  --learning_rate 0.1 \
  --mini_batch_size 128 \
  --print_freq 1024 \
  --test_mini_batch_size 16384 \
  --tensor_board_filename board/avazu \
  $dlrm_extra_option 2>&1 | tee run_avazu_tpu.log

echo "done"
