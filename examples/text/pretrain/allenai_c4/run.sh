#!/usr/bin/env bash
# Text pretraining recipe (allenai/c4 style), kaldi-staged.
# Parity: reference examples/text/pretrain/allenai_c4/run.sh — stage 0
# make_data, stage 1 hf->ckpt seed, stage 2 train, stage 3 ckpt->hf.
set -euo pipefail

stage=0
stop_stage=3
jsonl=data/c4.jsonl            # {"text": ...} per line
tokenizer=meta-llama/Llama-3.2-1B
model_config=Llama-3_2-1B.json
exp=exp/llama3_1b_pretrain     # exp id encodes the layout: cp1_tp1_dp8_pp1
data_dir=data/shards
steps=1000000
seqlen=16384

. "$(dirname "$0")/../../../parse_options.sh"

# parallel layout parsed from the exp id (reference convention)
dp=$(echo "$exp" | grep -oP 'dp\K[0-9]+' || echo -1)
tp=$(echo "$exp" | grep -oP 'tp\K[0-9]+' || echo 1)
cp=$(echo "$exp" | grep -oP 'cp\K[0-9]+' || echo 1)
pp=$(echo "$exp" | grep -oP 'pp\K[0-9]+' || echo 1)

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "stage 0: jsonl -> TouchDataset shards"
  python -m touchnet_tpu.bin.make_data \
    --save_dir "$data_dir" --jsonl_path "$jsonl" \
    --datatypes texttoken --tokenizer_model "$tokenizer" \
    --num_utt_per_shard 2000 --num_workers 16
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: (optional) HF seed checkpoint -> step_0"
  # python -m touchnet_tpu.bin.convert_hf_to_ckpt \
  #   --huggingface_model <hf_dir> --ckpt_dir "$exp" \
  #   --training_model_config_path "$model_config" --model_type causal_lm
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "stage 2: train"
  python -m touchnet_tpu.bin.train \
    --tokenizer_type HuggingFaceTokenizer --tokenizer_model "$tokenizer" \
    --datapipe_type causal_lm --datalist_path "$data_dir/data.list" \
    --datalist_epoch 100 --dataset_batchsize 1 --dataset_text_seqlen "$seqlen" \
    --training_model_name llama --training_model_config_path "$model_config" \
    --training_trace_dump_folder "$exp" \
    --training_data_parallel_shard_degree "$dp" \
    --training_tensor_parallel_degree "$tp" \
    --training_context_parallel_degree "$cp" \
    --training_pipeline_parallel_degree "$pp" \
    --training_activation_checkpoint_mode full \
    --training_enable_ckpt true --training_ckpt_interval 2000 \
    --training_ckpt_async_mode async \
    --lr_scheduler_steps "$steps" --lr_scheduler_warmup_steps 2000 \
    --optimizer_lr 3e-4
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "stage 3: checkpoint -> HF"
  python -m touchnet_tpu.bin.convert_ckpt_to_hf \
    --ckpt_dir "$exp" --training_model_config_path "$model_config" \
    --model_type causal_lm --step -1 --tokenizer_model "$tokenizer"
fi
