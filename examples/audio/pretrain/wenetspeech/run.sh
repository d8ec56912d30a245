#!/usr/bin/env bash
# BEST-RQ audio pretraining recipe (wenetspeech style).
# Parity: reference examples/audio/pretrain/wenetspeech/run.sh (packed
# 1x8192, BestRQ tokenizer, TouchAudioForCausalLM NTP).
set -euo pipefail

stage=0
stop_stage=2
jsonl=data/wenetspeech.jsonl   # {"key","wav"} per line
model_config=TouchAudio-1B.json
exp=exp/bestrq_1b_cp1_tp1_dp8_pp1
data_dir=data/audio_shards
steps=640000
seqlen=8192

. "$(dirname "$0")/../../../../parse_options.sh"

dp=$(echo "$exp" | grep -oP 'dp\K[0-9]+' || echo -1)
tp=$(echo "$exp" | grep -oP 'tp\K[0-9]+' || echo 1)
cp=$(echo "$exp" | grep -oP 'cp\K[0-9]+' || echo 1)

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  python -m touchnet_tpu.bin.make_data \
    --save_dir "$data_dir" --jsonl_path "$jsonl" \
    --datatypes audio+metainfo --num_utt_per_shard 1000 --num_workers 16
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  python -m touchnet_tpu.bin.train \
    --tokenizer_type BestRQTokenizer \
    --tokenizer_bestrq_vocab_size 8192 --tokenizer_bestrq_input_size 560 \
    --datapipe_type touch_audio --dataset_enable_pack true \
    --datalist_path "$data_dir/data.list" --datalist_epoch 100 \
    --dataset_batchsize 1 --dataset_audio_seqlen "$seqlen" \
    --dataset_text_seqlen "$seqlen" \
    --dataset_random_cut_audio true \
    --audiofeat_num_mel_bins 80 --audiofeat_stack_length 7 \
    --training_model_name touch_audio \
    --training_model_config_path "$model_config" \
    --training_trace_dump_folder "$exp" \
    --training_data_parallel_shard_degree "$dp" \
    --training_tensor_parallel_degree "$tp" \
    --training_context_parallel_degree "$cp" \
    --training_activation_checkpoint_mode full \
    --training_enable_ckpt true --training_ckpt_interval 5000 \
    --training_ckpt_async_mode async \
    --lr_scheduler_steps "$steps" --lr_scheduler_warmup_steps 32000 \
    --optimizer_lr 4e-4
fi
