#!/usr/bin/env bash
# ASR SFT recipe (WenetSpeech) for touch_audio / qwen2_audio / kimi_audio,
# with inference + textnorm + WER scoring.
# Parity: reference examples/audio/sft/asr/wenetspeech/run.sh:1-371 —
# stage 0 make_data, stage 1 HF seed ckpt, stage 2 SFT, stage 3 ckpt->HF,
# stage 4 batch inference -> SpeechIO-style textnorm + error_rate scoring.
# TPU adaptation: JAX single-controller; Kimi inference runs fp32 (reference
# docs/audio_sft_asr.md), others bf16.
set -euo pipefail

model_type=qwen2_audio     # touch_audio | qwen2_audio | kimi_audio
pretrained_weight_dir="Qwen/Qwen2-Audio-7B"
pretrained_tokenizer_dir="Qwen/Qwen2-Audio-7B"
wenet_datalist_dir=data/raw

stage=0
stop_stage=4
train_set=train_l
dev_set=dev
test_sets="test_net test_meeting"
param_dtype="bfloat16"
seed=2025
num_workers=12
prefetch=12
checkpoint_step=30000
liger=true

. "$(dirname "$0")/../../../parse_options.sh"

case "${model_type}" in
  qwen2_audio) model_config="Qwen2-Audio-7B" ;;
  kimi_audio)  model_config="Kimi-Audio-7B" ;;
  touch_audio) model_config="Touch-Audio-7B" ;;
  *) echo "unknown model_type ${model_type}"; exit 1 ;;
esac

exp_id="wenetspeech_2x8192_noneac_cp1_tp1_dp8_pp1_dynbatch_packloss_${model_config}_sft"
cp=$(echo "$exp_id" | grep -oP 'cp\d+' | grep -oP '\d+')
tp=$(echo "$exp_id" | grep -oP 'tp\d+' | grep -oP '\d+')
dp=$(echo "$exp_id" | grep -oP 'dp\d+' | grep -oP '\d+')
pp=$(echo "$exp_id" | grep -oP 'pp\d+' | grep -oP '\d+')
bs=$(echo "$exp_id" | grep -oP '\d+x\d+' | grep -oP '\d+' | head -n 1)
max_seq_len=$(echo "$exp_id" | grep -oP '\d+x\d+' | grep -oP '\d+' | tail -n 1)
echo "$0: ${exp_id}: cp=${cp}, tp=${tp}, dp=${dp}, pp=${pp}, bs=${bs}, max_seq_len=${max_seq_len}"

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
  echo "$0: stage 0: wav jsonl -> TouchDataset audio+metainfo shards"
  for x in ${train_set} ${dev_set} ${test_sets}; do
    if [ ! -f "data/${x}/data.list" ]; then
      mkdir -p "data/${x}"
      python -m touchnet_tpu.bin.make_data \
        --save_dir "data/${x}" \
        --jsonl_path "${wenet_datalist_dir}/${x}/data.jsonl" \
        --num_utt_per_shard 2000 \
        --num_workers 64 \
        --datatypes "audio+metainfo"
      # raw jsonl kept side-by-side for the inference stage
      cp "${wenet_datalist_dir}/${x}/data.jsonl" "data/${x}/data.list.raw"
    fi
  done
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
  echo "$0: stage 1: HF pretrained -> step_0 seed checkpoint"
  rm -rf "exp/${exp_id}"
  mkdir -p "exp/${exp_id}"
  python -m touchnet_tpu.bin.convert_hf_to_ckpt \
    --ckpt_dir "exp/${exp_id}" \
    --huggingface_model "${pretrained_weight_dir}" \
    --training_model_config_path "config/${model_config}.json" \
    --model_type "${model_type}"
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
  echo "$0: stage 2: SFT"
  python -m touchnet_tpu.bin.train \
    --tokenizer_type "HuggingFaceTokenizer" \
    --tokenizer_model "${pretrained_tokenizer_dir}" \
    --datapipe_type "${model_type}" \
    --datalist_path "data/${train_set}/data.list" \
    --datalist_dev_path "data/${dev_set}/data.list" \
    --datalist_sharding true \
    --datalist_epoch 10000 \
    --datalist_shuffling true \
    --dataset_shuffling true \
    --dataset_mmap true \
    --dataset_batchsize "${bs}" \
    --dataset_audio_seqlen "${max_seq_len}" \
    --dataset_text_seqlen "${max_seq_len}" \
    --audio_max_length_in_ms_for_filter 30000 \
    --audio_min_length_in_ms_for_filter 200 \
    --text_max_length_in_tokens_for_filter 400 \
    --text_min_length_in_tokens_for_filter 1 \
    --max_text_audio_ratio 1.0 \
    --min_text_audio_ratio 0.0005 \
    --audio_resample_rate 16000 \
    --audio_speed_perturb false \
    --audio_feat_type "log_mel_spectrogram" \
    --audiofeat_num_mel_bins 128 \
    --audiofeat_n_fft 400 \
    --audiofeat_hop_length 160 \
    --dataloader_num_workers "${num_workers}" \
    --dataloader_prefetch_factor "${prefetch}" \
    --training_description "wenetspeech asr sft (${model_type})" \
    --training_seed "${seed}" \
    --training_model_name "${model_type}" \
    --training_model_config_path "config/${model_config}.json" \
    --training_print_args true \
    --training_trace_dump_folder "exp/${exp_id}" \
    --training_fsdp_reshard_after_forward "default" \
    --training_context_parallel_degree "${cp}" \
    --training_tensor_parallel_degree "${tp}" \
    --training_data_parallel_shard_degree "${dp}" \
    --training_pipeline_parallel_degree "${pp}" \
    --training_enable_liger_kernel "${liger}" \
    --training_enable_ckpt true \
    --training_ckpt_load_step -1 \
    --training_ckpt_interval 2000 \
    --training_ckpt_keep_latest_k 2 \
    --training_ckpt_async_mode "async" \
    --training_log_freq 100 \
    --training_enable_tensorboard true \
    --training_save_tb_folder "tensorboard" \
    --training_tb_rank_0_only true \
    --training_mixed_precision_param "${param_dtype}" \
    --training_mixed_precision_reduce "float32" \
    --training_compile true \
    --training_gc_freq 1000 \
    --training_deterministic false \
    --training_max_norm 1.0 \
    --training_activation_checkpoint_mode "none" \
    --training_enable_profiling true \
    --training_profiling_freq 100 \
    --training_enable_memory_snapshot false \
    --optimizer_name "AdamW" \
    --optimizer_lr 2e-5 \
    --optimizer_impl "fused" \
    --lr_scheduler_steps 30000 \
    --lr_scheduler_warmup_steps 1000 \
    --lr_scheduler_decay_type "linear" \
    --lr_scheduler_lr_min 0.0
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
  echo "$0: stage 3: checkpoint -> HF"
  python -m touchnet_tpu.bin.convert_ckpt_to_hf \
    --ckpt_dir "exp/${exp_id}" \
    --step "${checkpoint_step}" \
    --config "config/${model_config}.json" \
    --model_type "${model_type}" \
    --tokenizer_model "${pretrained_tokenizer_dir}"
fi

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
  # Kimi inference runs fp32 (reference docs/audio_sft_asr.md:19)
  if [ "${model_type}" = "kimi_audio" ]; then
    model_dtype="float32"; batch_size=1
  else
    model_dtype="bfloat16"; batch_size=16
  fi
  if [ "${model_type}" = "touch_audio" ]; then
    instruct=""
  else
    instruct="Generate the transcription:"
  fi

  for data_type in ${test_sets}; do
    model_path="exp/${exp_id}/checkpoint_hf/step-${checkpoint_step}"
    output_dir="${model_path}/inference_result/${data_type}.${model_dtype}"
    echo "$0: stage 4: inference + WER on ${data_type} (${model_dtype})"

    python -m "touchnet_tpu.models.${model_type}.inference_${model_type}" \
      --model_path "${model_path}" \
      --model_dtype "${model_dtype}" \
      --instruct "${instruct}" \
      --data_list "data/${data_type}/data.list.raw" \
      --output_dir "${output_dir}" \
      --batch_size "${batch_size}" \
      --inference_enable_liger_kernel "${liger}" \
      --num_workers 16 \
      --prefetch 8

    cat "${output_dir}"/part* > "${output_dir}/final.jsonl"
    # ref/hyp as kaldi-ark "key<TAB>text"
    python - "$output_dir" <<'PY'
import json, sys
out = sys.argv[1]
with open(f"{out}/final.jsonl") as f, \
     open(f"{out}/trans.txt", "w") as t, open(f"{out}/raw_rec.txt", "w") as r:
    for line in f:
        rec = json.loads(line)
        t.write(f"{rec['key']}\t{rec.get('txt', '')}\n")
        r.write(f"{rec['key']}\t{rec.get('hyp', '')}\n")
PY

    # SpeechIO-style scoring: normalize both sides, then char-level WER
    echo "$0 --> Normalizing REF text ..."
    python -m touchnet_tpu.bin.textnorm_zh --format=ark \
      --to_upper --to_banjiao --remove_fillers --remove_erhua \
      "${output_dir}/trans.txt" "${output_dir}/ref.txt"
    echo "$0 --> Normalizing HYP text ..."
    # add "--cc_mode=t2s" if the hypothesis charset is traditional
    python -m touchnet_tpu.bin.textnorm_zh --format=ark \
      --to_upper --to_banjiao --remove_fillers --remove_erhua \
      "${output_dir}/raw_rec.txt" "${output_dir}/rec.txt"
    grep -v $'\t$' "${output_dir}/rec.txt" > "${output_dir}/rec_non_empty.txt"

    python -m touchnet_tpu.bin.error_rate_zh \
      --tokenizer char \
      --ref "${output_dir}/ref.txt" \
      --hyp "${output_dir}/rec_non_empty.txt" \
      --detail "${output_dir}/DETAILS.txt" | tee "${output_dir}/RESULTS.txt"
  done
fi
