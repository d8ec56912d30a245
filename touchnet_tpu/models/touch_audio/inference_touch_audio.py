# Copyright (c) 2026 touchnet_tpu authors.
# Batch ASR inference for TouchAudioForCausalLM.
#
# Capability parity: reference touchnet/models/touch_audio/
# inference_touch_audio.py — jsonl AudioDataset -> fbank chain -> padded
# batches -> generate -> per-rank part_N files. TPU path: the prompt is the
# projected audio-feature embedding sequence (+ optional bos), decode runs
# the jitted KV-cache loop.

import copy

import jax
import jax.numpy as jnp
import numpy as np

from touchnet_tpu.data import DataConfig, functions
from touchnet_tpu.models.llama.inference_llama import generate
from touchnet_tpu.models.touch_audio.configuration_touch_audio import (
    TouchAudioConfig,
)
from touchnet_tpu.tokenizer import TokenizerConfig
from touchnet_tpu.tokenizer.tokenizer import build_tokenizer
from touchnet_tpu.utils.cli import parse_args_into_dataclasses
from touchnet_tpu.utils.inference import (
    AudioJsonlDataset,
    InferenceConfig,
    batched,
    jnp_dtype,
    pad_right,
    part_file,
    prefetch_map,
    write_results,
)
from touchnet_tpu.utils.logging import init_logger, logger


def compute_features(sample, data_config: DataConfig):
    chain = iter([sample])
    chain = functions.audio_resample(chain, data_config)
    feat_fn = {
        "fbank": functions.audio_compute_fbank,
        "mfcc": functions.audio_compute_mfcc,
        "log_mel_spectrogram": functions.audio_compute_log_mel_spectrogram,
    }[data_config.audio_feat_type]
    chain = feat_fn(chain, data_config)
    chain = functions.audiofeat_stack(chain, data_config)
    return next(chain)["audiofeat"]


def load_params(config: InferenceConfig, model_config: TouchAudioConfig):
    from touchnet_tpu.bin.convert_hf_to_ckpt import load_hf_state_dict
    from touchnet_tpu.models.touch_audio.convert import params_from_hf_state_dict

    sd = load_hf_state_dict(config.model_path)
    return params_from_hf_state_dict(model_config, sd)


def main(argv=None):
    (config, data_config, tok_config) = parse_args_into_dataclasses(
        [InferenceConfig, DataConfig, TokenizerConfig], argv
    )
    init_logger()
    if config.output_type != "text":
        raise ValueError(
            "output_type='both' is a Kimi-Audio dual-stream feature; this "
            "model has no audio head"
        )
    model_config = TouchAudioConfig.from_json_file(
        config.training_model_config_path
    )
    tokenizer = build_tokenizer(tok_config)
    dtype = jnp_dtype(config.model_dtype)
    params = load_params(config, model_config)
    params = jax.tree.map(lambda x: jnp.asarray(x).astype(dtype), params)

    data_config = copy.deepcopy(data_config)
    data_config.audio_speed_perturb = False
    data_config.audiofeat_spec_aug = False
    data_config.audiofeat_spec_sub = False
    data_config.audiofeat_spec_trim = False

    rank, world = jax.process_index(), jax.process_count()
    dataset = AudioJsonlDataset(config.data_list, rank, world)
    results = []
    embed_w = params["language_model"]["model"]["embed_tokens"]["weight"]
    proj_w = params["projector"]["weight"]
    bos = tokenizer.bos

    proj_np = np.asarray(proj_w, np.float32)
    bos_emb = np.asarray(embed_w, np.float32)[bos][None]

    def prepare(raw):
        s = dataset.load(raw)
        f = compute_features(s, data_config)
        # per-row prompt = projected audio features followed by bos embedding
        prompt = np.concatenate(
            [f.astype(np.float32) @ proj_np.T, bos_emb], axis=0
        )
        return s, prompt

    stream = prefetch_map(
        prepare, dataset.samples, config.num_workers,
        max(config.prefetch, 1) * config.batch_size,
    )
    for pairs in batched(stream, config.batch_size):
        batch = [s for s, _ in pairs]
        prompts = [p for _, p in pairs]
        lens = np.asarray([p.shape[0] for p in prompts], np.int32)
        prompt = jnp.asarray(pad_right(prompts, 0.0))
        out = generate(
            params["language_model"], model_config.text_config, prompt,
            jnp.asarray(lens), config.max_length, eos_id=tokenizer.eos,
            compute_dtype=dtype,
            prefill_chunk=config.inference_prefill_chunk or None,
            # greedy + banned repeated bigrams + repetition penalty: the
            # reference's decode config (do_sample=False,
            # no_repeat_ngram_size=2, repetition_penalty=1.5 — HF applies
            # both PROCESSORS even to greedy search, reference touchnet/
            # models/touch_audio/inference_touch_audio.py:177-186); the
            # full-history window reproduces HF's penalty-over-all-
            # generated-ids semantics (parity-pinned in
            # tests/.../models/test_inference.py). The reference prompts
            # with input_ids=[pad]*(T-1)+[bos] (ref :75-81), so HF's
            # processors also cover the pad/bos PROMPT ids — prime_tokens
            # reproduces that (penalty set {pad,bos}, prompt bigrams
            # {(pad,pad),(pad,bos)}); matters when pad == eos, where the
            # reference systematically penalizes the eos logit.
            no_repeat_ngram_size=2,
            repetition_penalty=1.5,
            repetition_window=config.max_length,
            prime_tokens=(
                (tokenizer.pad, tokenizer.pad, bos)
                if tokenizer.pad is not None else (bos,)
            ),
        )
        for s, toks in zip(batch, np.asarray(out)):
            toks = [int(t) for t in toks if int(t) != tokenizer.eos]
            hyp = tokenizer.detokenize(toks)
            results.append({"key": s["key"], "txt": s.get("txt", ""), "hyp": hyp})
        logger.info(f"decoded {len(results)}/{len(dataset)}")

    write_results(part_file(config.output_dir, rank), results)


if __name__ == "__main__":
    main()
