# Copyright (c) 2026 touchnet_tpu authors.
# Batch ASR inference for Kimi-Audio.
#
# Capability parity: reference touchnet/models/kimi_audio/
# inference_kimi_audio.py — dual-stream S2T prompts, whisper features,
# custom generate, part files. --output_type text (default, ASR): text
# stream decoded with the audio stream held at <|im_kimia_text_blank|>;
# --output_type both: full dual-stream decode (generate_kimi_audio.py)
# sampling the mimo audio head, emitting vocoder-ready VQ codes.

import jax
import jax.numpy as jnp
import numpy as np

from touchnet_tpu.data import DataConfig
from touchnet_tpu.models.kimi_audio.configuration_kimi_audio import KimiAudioConfig
from touchnet_tpu.models.kimi_audio.modeling_kimi_audio import (
    prepare_audio_input_embs,
)
from touchnet_tpu.models.kimi_audio.processing_kimi_audio import (
    KIMI_AUDIO_TEMPLATE_FOR_S2T,
    KIMI_TEXT_TEMPLATE_FOR_S2T,
)
from touchnet_tpu.models.llama.inference_llama import generate
from touchnet_tpu.models.qwen2_audio.processing_qwen2_audio import whisper_features
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
    if config.output_type not in ("text", "both"):
        raise ValueError(
            f"output_type={config.output_type!r}: must be 'text' (ASR) or "
            "'both' (dual-stream with VQ audio codes)"
        )
    model_config = KimiAudioConfig.from_json_file(config.training_model_config_path)
    tokenizer = build_tokenizer(tok_config)

    from touchnet_tpu.bin.convert_hf_to_ckpt import load_hf_state_dict
    from touchnet_tpu.models.kimi_audio.convert import params_from_hf_state_dict

    dtype = jnp_dtype(config.model_dtype)
    params = jax.tree.map(
        lambda x: jnp.asarray(x).astype(dtype), params_from_hf_state_dict(
            model_config, load_hf_state_dict(config.model_path)
        )
    )
    embed_w = params["model"]["embed_tokens"]["weight"]
    blank = "<|im_kimia_text_blank|>"
    blank_id = tokenizer.tokenize(blank, add_special_tokens=False)[0]
    eos_id = tokenizer.tokenize(
        "<|im_kimia_text_eos|>", add_special_tokens=False
    )[0]

    def tok(t):
        return tokenizer.tokenize(t, add_special_tokens=False)

    rank, world = jax.process_index(), jax.process_count()
    dataset = AudioJsonlDataset(config.data_list, rank, world)
    results = []
    n_mels = model_config.speech_encoder_config.num_mel_bins

    # lm-view of the backbone for the shared generate loop
    lm_params = {
        "model": {
            "embed_tokens": params["model"]["embed_tokens"],
            "layers": params["model"]["layers"],
            "norm": params["model"]["norm"],
        },
        "lm_head": params["lm_head"],
    }
    blank_emb = embed_w[blank_id]

    def embed_fn(toks):
        # dual stream during decode: audio stream stays blank
        return jnp.take(embed_w, toks, axis=0) + blank_emb[None]

    def prepare(raw):
        s = dataset.load(raw)
        feats, fmask = whisper_features(s["waveform"], s["sample_rate"], n_mels)
        n_tok = int(fmask[::2][::4].sum())
        text_prompt = KIMI_TEXT_TEMPLATE_FOR_S2T.replace(
            "<|INSTRUCT|>", config.instruct
        ).replace("<|AUDIO|>", blank * n_tok)
        audio_prompt = KIMI_AUDIO_TEMPLATE_FOR_S2T.replace(
            "<|INSTRUCT|>", blank * len(tok(config.instruct))
        ).replace("<|AUDIO|>", blank * n_tok)
        return (s, np.asarray(tok(text_prompt), np.int32),
                np.asarray(tok(audio_prompt), np.int32), feats, fmask)

    stream = prefetch_map(
        prepare, dataset.samples, config.num_workers,
        max(config.prefetch, 1) * config.batch_size,
    )
    for rows in batched(stream, config.batch_size):
        batch = [r[0] for r in rows]
        text_ids_list = [r[1] for r in rows]
        audio_ids_list = [r[2] for r in rows]
        feats_list = [r[3] for r in rows]
        fmask_list = [r[4] for r in rows]
        lens = np.asarray([len(i) for i in text_ids_list], np.int32)
        text_ids = jnp.asarray(pad_right(text_ids_list, 0))
        audio_ids = jnp.asarray(pad_right(audio_ids_list, 0))
        feats = jnp.asarray(pad_right(feats_list, 0.0)).transpose(0, 2, 1)
        fmask = jnp.asarray(pad_right(fmask_list, 0))

        audio_embs = jnp.take(embed_w, audio_ids, axis=0).astype(dtype)
        audio_embs = prepare_audio_input_embs(
            params, audio_ids, audio_embs, feats, fmask, model_config,
            dtype,
        )
        prompt = audio_embs + jnp.take(embed_w, text_ids, axis=0)
        audio_codes = None
        if config.output_type == "both":
            # dual-stream decode: mimo audio head sampled alongside text
            # (reference _generate_loop; audio tokens are VQ codes offset
            # by kimia_token_offset, vocoder-ready)
            from touchnet_tpu.models.kimi_audio.generate_kimi_audio import (
                generate_dual,
            )

            out, audio_out = generate_dual(
                params, model_config, prompt, jnp.asarray(lens),
                config.max_length, blank_id=blank_id, eos_id=eos_id,
                output_type="both", compute_dtype=dtype,
                prefill_chunk=config.inference_prefill_chunk or None,
            )
            audio_codes = np.asarray(audio_out)
        else:
            out = generate(
                lm_params, model_config.text_config, prompt, jnp.asarray(lens),
                config.max_length, eos_id=eos_id, embed_fn=embed_fn,
                # reference generate() text defaults: greedy WITH
                # repetition penalty 1.1 over a 16-token window
                # (touchnet/models/kimi_audio/modeling_kimi_audio.py:
                # 1084-1100, applied before the argmax)
                temperature=0.0, repetition_penalty=1.1,
                repetition_window=16, compute_dtype=dtype,
                prefill_chunk=config.inference_prefill_chunk or None,
            )
        for i, (s, toks_out) in enumerate(zip(batch, np.asarray(out))):
            toks_out = [int(t) for t in toks_out
                        if int(t) not in (eos_id, blank_id)]
            row = {
                "key": s["key"], "txt": s.get("txt", ""),
                "hyp": tokenizer.detokenize(toks_out),
            }
            if audio_codes is not None:
                off = model_config.kimia_token_offset
                row["audio_codes"] = [
                    int(t) - off for t in audio_codes[i]
                    if int(t) != blank_id and int(t) >= off
                ]
            results.append(row)
        logger.info(f"decoded {len(results)}/{len(dataset)}")
    write_results(part_file(config.output_dir, rank), results)
    del data_config  # parsed for recipe-flag compatibility only


if __name__ == "__main__":
    main()
