#!/usr/bin/env bash
# ASR SFT recipe (wenetspeech style) for touch_audio / qwen2_audio /
# kimi_audio, with inference + textnorm + WER scoring.
# Parity: reference examples/audio/sft/asr/wenetspeech/run.sh stages 0-4.
set -euo pipefail

stage=0
stop_stage=4
model=qwen2_audio              # touch_audio | qwen2_audio | kimi_audio
jsonl=data/wenetspeech_train.jsonl
test_jsonl=data/test_net.jsonl
hf_model=Qwen/Qwen2-Audio-7B
model_config=config.json
tokenizer=$hf_model
exp=exp/${model}_sft_cp1_tp1_dp8_pp1
data_dir=data/asr_shards
steps=30000

. "$(dirname "$0")/../../../../../parse_options.sh"

dp=$(echo "$exp" | grep -oP 'dp\K[0-9]+' || echo -1)

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  python -m touchnet_tpu.bin.make_data \
    --save_dir "$data_dir" --jsonl_path "$jsonl" \
    --datatypes audio+metainfo --num_utt_per_shard 1000 --num_workers 16
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  python -m touchnet_tpu.bin.convert_hf_to_ckpt \
    --huggingface_model "$hf_model" --ckpt_dir "$exp" \
    --training_model_config_path "$model_config" --model_type "$model"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  python -m touchnet_tpu.bin.train \
    --tokenizer_type HuggingFaceTokenizer --tokenizer_model "$tokenizer" \
    --datapipe_type "$model" --processor_model "$hf_model" \
    --datalist_path "$data_dir/data.list" --datalist_epoch 100 \
    --dataset_batchsize 2 --dataset_text_seqlen 8192 \
    --dataset_audio_seqlen 8192 \
    --training_model_name "$model" \
    --training_model_config_path "$model_config" \
    --training_trace_dump_folder "$exp" \
    --training_data_parallel_shard_degree "$dp" \
    --training_activation_checkpoint_mode full \
    --training_enable_ckpt true --training_ckpt_interval 1000 \
    --training_ckpt_async_mode async --training_ckpt_load_step 0 \
    --lr_scheduler_steps "$steps" --lr_scheduler_warmup_steps 1000 \
    --optimizer_lr 2e-5
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  python -m touchnet_tpu.bin.convert_ckpt_to_hf \
    --ckpt_dir "$exp" --training_model_config_path "$model_config" \
    --model_type "$model" --step -1 --tokenizer_model "$tokenizer"
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  python -m "touchnet_tpu.models.${model}.inference_${model}" \
    --model_path "$exp/checkpoint_hf/latest" \
    --training_model_config_path "$model_config" \
    --tokenizer_model "$tokenizer" \
    --data_list "$test_jsonl" --output_dir "$exp/inference" \
    --batch_size 8 --max_length 256
  python -m touchnet_tpu.bin.error_rate_zh \
    --jsonl "$exp"/inference/part_* --detail "$exp/inference/wer_detail.txt"
fi
