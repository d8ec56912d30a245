#!/usr/bin/env bash
# Text pretraining recipe (allenai/c4), kaldi-staged.
# Parity: reference examples/text/pretrain/allenai_c4/run.sh:1-191 —
# stage -1 download, stage 0 make_data (+ dev head-20 list), stage 1 seed
# checkpoint (continued pretraining), stage 2 train (full knob set),
# stage 3 ckpt->HF. TPU adaptation: torchrun/rdzv becomes the JAX
# single-controller; multi-host pods export COORDINATOR_ADDRESS /
# NUM_PROCESSES / PROCESS_ID before launch; XLA_FLAGS must be exported in
# this launcher (flags set after backend init are rejected loudly).
set -euo pipefail

# ---- user setup -------------------------------------------------------------
pretrained_weight_dir=""   # set for continued pretraining; empty = fromscratch
pretrained_tokenizer_dir="meta-llama/Llama-3.2-1B"
jsonl_dir=data/jsonl       # converted {"key","txt"} jsonl files per split
model_config=Llama-3_2-1B

stage=0
stop_stage=3
train_set=train
dev_set=validation
param_dtype="bfloat16"
seed=2025
num_workers=12
prefetch=12
checkpoint_step=1000000

# multi-host (TPU pod) launch: every host runs this script with its own
# PROCESS_ID; single host needs none of these
# export COORDINATOR_ADDRESS="10.0.0.1:8476"
# export NUM_PROCESSES=4
# export PROCESS_ID=0

# async-TP collective overlap must be in the env before jax initializes
# export XLA_FLAGS="--xla_tpu_enable_async_collective_fusion=true --xla_tpu_enable_async_collective_fusion_fuse_all_gather=true --xla_tpu_overlap_compute_collective_tc=true --xla_enable_async_all_gather=true"

. "$(dirname "$0")/../../../parse_options.sh"

if [ "${pretrained_weight_dir}" != "" ]; then
  exp_suffix="frompretrain"
else
  exp_suffix="fromscratch"
fi

# exp id encodes the parallel layout + batch geometry (reference convention)
exp_id="c4.en_1x16384_opsmallac_cp1_tp1_dp8_pp1_flash_packloss_tieemb_linear2K1M_${model_config}_${exp_suffix}"
cp=$(echo "$exp_id" | grep -oP 'cp\d+' | grep -oP '\d+')
tp=$(echo "$exp_id" | grep -oP 'tp\d+' | grep -oP '\d+')
dp=$(echo "$exp_id" | grep -oP 'dp\d+' | grep -oP '\d+')
pp=$(echo "$exp_id" | grep -oP 'pp\d+' | grep -oP '\d+')
bs=$(echo "$exp_id" | grep -oP '\d+x\d+' | grep -oP '\d+' | head -n 1)
max_seq_len=$(echo "$exp_id" | grep -oP '\d+x\d+' | grep -oP '\d+' | tail -n 1)
echo "$0: ${exp_id}: cp=${cp}, tp=${tp}, dp=${dp}, pp=${pp}, bs=${bs}, max_seq_len=${max_seq_len}"

if [ "${stage}" -le -1 ] && [ "${stop_stage}" -ge -1 ]; then
  echo "$0: stage -1: download allenai/c4 and convert to jsonl"
  python download_c4.py --output_dir "${jsonl_dir}"
fi

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
  echo "$0: stage 0: jsonl -> TouchDataset shards"
  for x in ${train_set} ${dev_set}; do
    if [ ! -f "data/${x}/data.list" ]; then
      mkdir -p "data/${x}"
      for text in "${jsonl_dir}/${x}"*.jsonl; do
        echo "$0: processing ${text}"
        mkdir -p "data/${x}/$(basename "$text")"
        python -m touchnet_tpu.bin.make_data \
          --save_dir "data/${x}/$(basename "$text")" \
          --jsonl_path "${text}" \
          --tokenizer_model "${pretrained_tokenizer_dir}" \
          --tokenizer_type "HuggingFaceTokenizer" \
          --num_utt_per_shard 2000 \
          --num_workers 16 \
          --datatypes "texttoken"
      done
      cat data/${x}/*/data.list > "data/${x}/data.list"
    fi
  done
  # small dev subset to keep validation fast (reference head-20)
  if [ ! -f "data/${dev_set}/data.list.head20" ]; then
    shuf "data/${dev_set}/data.list" | head -20 > "data/${dev_set}/data.list.head20"
  fi
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ] && [ "${pretrained_weight_dir}" != "" ]; then
  echo "$0: stage 1: HF seed checkpoint -> step_0 (continued pretraining)"
  rm -rf "exp/${exp_id}"
  mkdir -p "exp/${exp_id}"
  python -m touchnet_tpu.bin.convert_hf_to_ckpt \
    --ckpt_dir "exp/${exp_id}" \
    --huggingface_model "${pretrained_weight_dir}" \
    --training_model_config_path "config/${model_config}.json" \
    --model_type causal_lm
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
  echo "$0: stage 2: train"
  # elastic wrapper (reference: torchrun --max-restarts): a crashed or
  # watchdog-aborted (training_abort_on_timeout, exit 124) run restarts
  # and resumes from the latest checkpoint (training_ckpt_load_step=-1)
  python -m touchnet_tpu.bin.elastic --max-restarts 3 -- \
  python -m touchnet_tpu.bin.train \
    --training_abort_on_timeout true \
    --tokenizer_model "${pretrained_tokenizer_dir}" \
    --tokenizer_type "HuggingFaceTokenizer" \
    --datapipe_type "causal_lm" \
    --datalist_path "data/${train_set}/data.list" \
    --datalist_dev_path "data/${dev_set}/data.list.head20" \
    --datalist_sharding true \
    --datalist_epoch 10000 \
    --datalist_shuffling true \
    --dataset_shuffling true \
    --dataset_mmap true \
    --dataset_batchsize "${bs}" \
    --dataset_text_seqlen "${max_seq_len}" \
    --text_max_length_in_tokens_for_filter "$((max_seq_len - 2))" \
    --text_min_length_in_tokens_for_filter 1 \
    --dataloader_num_workers "${num_workers}" \
    --dataloader_prefetch_factor "${prefetch}" \
    --training_description "allenai c4.en" \
    --training_seed "${seed}" \
    --training_model_name "llama" \
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
    --training_max_norm 1.0 \
    --training_activation_checkpoint_mode "op_small" \
    `# op_small = measured-best at packed-16k on one 16 GiB chip (the
     # reference recipe uses full AC); docs/long_context.md has the
     # remat-policy-by-seqlen table — re-sweep per multi-chip topology` \
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
    --lr_scheduler_steps 1000000 \
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
    --model_type causal_lm \
    --tokenizer_model "${pretrained_tokenizer_dir}"
fi
