#!/bin/bash
# DCN on Criteo Terabyte — reference bench/dcn.sh: dim 128, lr 0.1,
# batch 2048, max-ind-range 40M, test every 102400 iterations.

dlrm_extra_option=${1:-}
DATA=${DATA:-datasets/criteotb}

python main.py \
  --model dcn \
  --dataset criteotb \
  --data_path "$DATA" \
  --embedding_dim 128 \
  --max_ind_range 40000000 \
  --learning_rate 0.1 \
  --mini_batch_size 2048 \
  --print_freq 2048 \
  --test_freq 102400 \
  --test_mini_batch_size 16384 \
  --tensor_board_filename board/dcn_criteotb \
  $dlrm_extra_option 2>&1 | tee run_dcn_tpu.log

echo "done"
