# Copyright (c) 2026 touchnet_tpu authors.
# Batch ASR inference for Qwen2-Audio.
#
# Capability parity: reference touchnet/models/qwen2_audio/
# inference_qwen2_audio.py — jsonl dataset -> whisper features -> prompt with
# expanded <|AUDIO|> tokens -> generate -> part files.

import jax
import jax.numpy as jnp
import numpy as np

from touchnet_tpu.data import DataConfig
from touchnet_tpu.models.llama.inference_llama import generate
from touchnet_tpu.models.qwen2_audio.configuration_qwen2_audio import (
    Qwen2AudioConfig,
)
from touchnet_tpu.models.qwen2_audio.modeling_qwen2_audio import (
    encode_audio,
    merge_audio_into_text,
)
from touchnet_tpu.models.qwen2_audio.processing_qwen2_audio import (
    QWEN2_AUDIO_TEMPLATE_FOR_S2T,
    whisper_features,
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
    model_config = Qwen2AudioConfig.from_json_file(config.training_model_config_path)
    tokenizer = build_tokenizer(tok_config)

    from touchnet_tpu.bin.convert_hf_to_ckpt import load_hf_state_dict
    from touchnet_tpu.models.qwen2_audio.convert import params_from_hf_state_dict

    dtype = jnp_dtype(config.model_dtype)
    params = jax.tree.map(
        lambda x: jnp.asarray(x).astype(dtype), params_from_hf_state_dict(
            model_config, load_hf_state_dict(config.model_path)
        )
    )
    embed_w = params["language_model"]["model"]["embed_tokens"]["weight"]

    rank, world = jax.process_index(), jax.process_count()
    dataset = AudioJsonlDataset(config.data_list, rank, world)
    results = []
    n_mels = model_config.audio_config.num_mel_bins

    def prepare(raw):
        s = dataset.load(raw)
        feats, fmask = whisper_features(s["waveform"], s["sample_rate"], n_mels)
        audio_len = int(fmask.sum())
        n_tok = ((audio_len - 1) // 2 + 1 - 2) // 2 + 1
        text = QWEN2_AUDIO_TEMPLATE_FOR_S2T.replace(
            "<|INSTRUCT|>", config.instruct
        ).replace("<|AUDIO|>", "<|AUDIO|>" * n_tok, 1)
        ids = np.asarray(
            tokenizer.tokenize(text, add_special_tokens=False), np.int32
        )
        return s, ids, feats

    stream = prefetch_map(
        prepare, dataset.samples, config.num_workers,
        max(config.prefetch, 1) * config.batch_size,
    )
    for triples in batched(stream, config.batch_size):
        batch = [s for s, _, _ in triples]
        ids_list = [i for _, i, _ in triples]
        feats_list = [f for _, _, f in triples]
        lens = np.asarray([len(i) for i in ids_list], np.int32)
        ids = jnp.asarray(pad_right(ids_list, 0))
        feats = jnp.asarray(pad_right(feats_list, 0.0)).transpose(0, 2, 1)
        text_emb = jnp.take(embed_w, ids, axis=0)
        audio_emb = encode_audio(params, feats, model_config, dtype)
        prompt = merge_audio_into_text(
            text_emb, audio_emb, ids, model_config.audio_token_index
        )
        out = generate(
            params["language_model"], model_config.text_config, prompt,
            jnp.asarray(lens), config.max_length, eos_id=tokenizer.eos,
            compute_dtype=dtype,
            prefill_chunk=config.inference_prefill_chunk or None,
        )
        for s, toks in zip(batch, np.asarray(out)):
            toks = [int(t) for t in toks if int(t) != tokenizer.eos]
            results.append({
                "key": s["key"], "txt": s.get("txt", ""),
                "hyp": tokenizer.detokenize(toks),
            })
        logger.info(f"decoded {len(results)}/{len(dataset)}")
    write_results(part_file(config.output_dir, rank), results)
    del data_config  # parsed for recipe-flag compatibility only


if __name__ == "__main__":
    main()
