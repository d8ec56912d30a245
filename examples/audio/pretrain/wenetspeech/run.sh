#!/usr/bin/env bash
# Audio SSL pretraining recipe (WenetSpeech, BEST-RQ), kaldi-staged.
# Parity: reference examples/audio/pretrain/wenetspeech/run.sh:1-207 —
# stage -1 download, stage 0 make_data (audio+metainfo), stage 1 seed ckpt,
# stage 2 BEST-RQ NTP training (full audio-frontend knob set), stage 3
# ckpt->HF. TPU adaptation: JAX single-controller instead of torchrun; the
# multi-host env block and XLA_FLAGS note in
# examples/text/pretrain/allenai_c4/run.sh applies here too.
set -euo pipefail

pretrained_weight_dir=""
pretrained_tokenizer_dir="meta-llama/Llama-3.2-1B"
wenet_datalist_dir=data/raw   # per-split jsonl of {"key","wav","txt"} lines
model_config=Touch-Audio-1B

stage=0
stop_stage=3
train_set=train_l
dev_set=dev
test_sets=""
param_dtype="bfloat16"
seed=2025
num_workers=12
prefetch=12
num_mel_bins=80
checkpoint_step=640000
# offline_tokenize=true builds audio+metainfo+audiotoken shards in stage 0:
# BEST-RQ codes are computed ONCE at data-prep time (bin/make_data.py
# audiotoken builder) and the training datapipe reads them instead of
# re-running the projection + codebook argmin in every epoch's CPU workers.
# Requires audio_speed_perturb=false (codes align to unperturbed frames;
# the decoder enforces this, data/datapipe.py audio+metainfo+audiotoken).
offline_tokenize=false

. "$(dirname "$0")/../../../parse_options.sh"

if [ "${pretrained_weight_dir}" != "" ]; then
  exp_suffix="frompretrain"
else
  exp_suffix="fromscratch"
fi

# exp id encodes layout + frontend geometry (reference convention)
exp_id="wenetspeech_1x8192_noneac_cp1_tp1_dp8_pp1_stack5_stride4_flash_packloss_bestrq_cb1024_emb16_${model_config}_${exp_suffix}_640k"
cp=$(echo "$exp_id" | grep -oP 'cp\d+' | grep -oP '\d+')
tp=$(echo "$exp_id" | grep -oP 'tp\d+' | grep -oP '\d+')
dp=$(echo "$exp_id" | grep -oP 'dp\d+' | grep -oP '\d+')
pp=$(echo "$exp_id" | grep -oP 'pp\d+' | grep -oP '\d+')
stack=$(echo "$exp_id" | grep -oP 'stack\d+' | grep -oP '\d+')
stride=$(echo "$exp_id" | grep -oP 'stride\d+' | grep -oP '\d+')
bs=$(echo "$exp_id" | grep -oP '\d+x\d+' | grep -oP '\d+' | head -n 1)
max_seq_len=$(echo "$exp_id" | grep -oP '\d+x\d+' | grep -oP '\d+' | tail -n 1)
echo "$0: ${exp_id}: cp=${cp}, tp=${tp}, dp=${dp}, pp=${pp}, stack=${stack}, stride=${stride}, bs=${bs}, max_seq_len=${max_seq_len}"

if [ "${stage}" -le -1 ] && [ "${stop_stage}" -ge -1 ]; then
  echo "$0: stage -1: download WenetSpeech and build per-split jsonl"
  python download_wenetspeech.py --output_dir "${wenet_datalist_dir}"
fi

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
  echo "$0: stage 0: wav jsonl -> TouchDataset shards"
  datatypes="audio+metainfo"
  offline_args=()
  if [ "${offline_tokenize}" = "true" ]; then
    datatypes="audio+metainfo+audiotoken"
    stack=$(echo "$exp_id" | grep -oP 'stack\d+' | grep -oP '\d+')
    offline_args=(
      --tokenizer_type BestRQTokenizer
      --tokenizer_bestrq_vocab_size 1024
      --tokenizer_bestrq_input_size "$((stack * num_mel_bins))"
      --tokenizer_bestrq_emb_size 16
      --tokenizer_bestrq_init_seed "${seed}"
      --audio_feat_type fbank
      --audiofeat_num_mel_bins "${num_mel_bins}"
      --audiofeat_dither 0.0
      --audiofeat_stack_length "$(echo "$exp_id" | grep -oP 'stack\d+' | grep -oP '\d+')"
      --audiofeat_stride_length "$(echo "$exp_id" | grep -oP 'stride\d+' | grep -oP '\d+')"
      --audiofeat_normalize true
    )
  fi
  for x in ${train_set} ${dev_set} ${test_sets}; do
    if [ ! -f "data/${x}/data.list" ]; then
      mkdir -p "data/${x}"
      python -m touchnet_tpu.bin.make_data \
        --save_dir "data/${x}" \
        --jsonl_path "${wenet_datalist_dir}/${x}/data.jsonl" \
        --num_utt_per_shard 2000 \
        --num_workers 64 \
        --datatypes "${datatypes}" "${offline_args[@]}"
    fi
  done
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ] && [ "${pretrained_weight_dir}" != "" ]; then
  echo "$0: stage 1: HF seed checkpoint -> step_0"
  rm -rf "exp/${exp_id}"
  mkdir -p "exp/${exp_id}"
  python -m touchnet_tpu.bin.convert_hf_to_ckpt \
    --ckpt_dir "exp/${exp_id}" \
    --huggingface_model "${pretrained_weight_dir}" \
    --training_model_config_path "config/${model_config}.json" \
    --model_type touch_audio
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
  echo "$0: stage 2: BEST-RQ pretraining"
  python -m touchnet_tpu.bin.train \
    --tokenizer_type "BestRQTokenizer" \
    --tokenizer_bestrq_vocab_size 1024 \
    --tokenizer_bestrq_input_size "$((stack * num_mel_bins))" \
    --tokenizer_bestrq_emb_size 16 \
    --tokenizer_bestrq_init_seed "${seed}" \
    --tokenizer_bestrq_init_method "default" \
    --datapipe_type "touch_audio" \
    --datalist_path "data/${train_set}/data.list" \
    --datalist_dev_path "data/${dev_set}/data.list" \
    --datalist_sharding true \
    --datalist_epoch 10000 \
    --datalist_shuffling true \
    --dataset_random_cut_audio false \
    --dataset_random_cut_audio_min_length_in_ms 5000 \
    --dataset_random_cut_audio_max_length_in_ms 3600000 \
    --dataset_shuffling true \
    --dataset_mmap true \
    --dataset_batchsize "${bs}" \
    --dataset_audio_seqlen "${max_seq_len}" \
    --dataset_text_seqlen "${max_seq_len}" \
    --audio_max_length_in_ms_for_filter "$((max_seq_len * stride * 10 - 200))" \
    --audio_min_length_in_ms_for_filter 200 \
    --text_max_length_in_tokens_for_filter "$((max_seq_len - 1))" \
    --text_min_length_in_tokens_for_filter 1 \
    --max_text_audio_ratio 1.0 \
    --min_text_audio_ratio 0.0005 \
    --audio_resample_rate 16000 \
    --audio_speed_perturb "$([ "${offline_tokenize}" = "true" ] && echo false || echo true)" \
    --audio_feat_type "fbank" \
    --audiofeat_spec_aug false \
    --audiofeat_spec_aug_num_t_mask 2 \
    --audiofeat_spec_aug_num_f_mask 2 \
    --audiofeat_spec_aug_max_t 50 \
    --audiofeat_spec_aug_max_f 10 \
    --audiofeat_spec_sub false \
    --audiofeat_spec_sub_num_t_sub 3 \
    --audiofeat_spec_sub_max_t 30 \
    --audiofeat_spec_trim false \
    --audiofeat_spec_trim_max_t 20 \
    --audiofeat_num_mel_bins "${num_mel_bins}" \
    --audiofeat_frame_length 25 \
    --audiofeat_frame_shift 10 \
    --audiofeat_dither 0.0 \
    --audiofeat_stack_length "${stack}" \
    --audiofeat_stride_length "${stride}" \
    --audiofeat_normalize true \
    --dataloader_num_workers "${num_workers}" \
    --dataloader_prefetch_factor "${prefetch}" \
    --training_description "wenetspeech ssl" \
    --training_seed "${seed}" \
    --training_model_name "touch_audio" \
    --training_model_config_path "config/${model_config}.json" \
    --training_print_args true \
    --training_trace_dump_folder "exp/${exp_id}" \
    --training_fsdp_reshard_after_forward "default" \
    --training_context_parallel_degree "${cp}" \
    --training_context_parallel_rotate_method "allgather" \
    --training_tensor_parallel_degree "${tp}" \
    --training_data_parallel_shard_degree "${dp}" \
    --training_enable_loss_parallel true \
    --training_enable_liger_kernel true \
    --training_pipeline_parallel_degree "${pp}" \
    --training_pipeline_parallel_schedule "1F1B" \
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
    --training_enable_compiled_autograd false \
    --training_gc_freq 1000 \
    --training_deterministic false \
    --training_max_norm 5.0 \
    --training_activation_checkpoint_mode "none" \
    --training_activation_checkpoint_selective_ac_option "op" \
    --training_enable_profiling true \
    --training_profiling_traces_folder "profile_traces" \
    --training_profiling_freq 100 \
    --training_profiling_keep_first_k 10 \
    --training_enable_memory_snapshot true \
    --training_memory_snapshot_folder "memory_snapshot" \
    --optimizer_name "AdamW" \
    --optimizer_lr 8e-4 \
    --optimizer_impl "fused" \
    --lr_scheduler_steps 640000 \
    --lr_scheduler_warmup_steps 2000 \
    --lr_scheduler_decay_type "linear" \
    --lr_scheduler_lr_min 0.0
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
  echo "$0: stage 3: checkpoint -> HF"
  python -m touchnet_tpu.bin.convert_ckpt_to_hf \
    --ckpt_dir "exp/${exp_id}" \
    --step "${checkpoint_step}" \
    --config "config/${model_config}.json" \
    --model_type touch_audio \
    --tokenizer_model "${pretrained_tokenizer_dir}"
fi
