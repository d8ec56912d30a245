# Copyright (c) 2026 touchnet_tpu authors.
# HF <-> touchnet_tpu conversion for Kimi-Audio (MoonshotKimiaForCausalLM).
#
# HF keys: model.embed_tokens / model.layers.{i}.* / model.norm /
# model.mimo_layers.{i}.* / model.mimo_norm / model.vq_adaptor.layers.{0,3,4} /
# speech_encoder.* (whisper) / speech_tokenizer.* (WhisperVQ: convs, two pos
# tables, codebook, 16 whisper layers) / lm_head / mimo_output.

from typing import Dict

import numpy as np

from touchnet_tpu.models.kimi_audio.configuration_kimi_audio import KimiAudioConfig
from touchnet_tpu.models.llama import convert as llama_convert
from touchnet_tpu.models.qwen2_audio.convert import tower_from_hf, tower_to_hf


def _stack_llama_layers(sd, L, prefix):
    sub = {
        k.replace(f"{prefix}", "model.layers.", 1): v
        for k, v in sd.items()
        if k.startswith(prefix)
    }
    # reuse the llama layer stacker by faking a model.layers namespace
    fake = dict(sub)
    fake["model.embed_tokens.weight"] = np.zeros((1, 1), np.float32)
    fake["model.norm.weight"] = np.zeros((1,), np.float32)
    from touchnet_tpu.models.llama.configuration_llama import LlamaConfig

    cfg = LlamaConfig(num_hidden_layers=L, tie_word_embeddings=True)
    return llama_convert.params_from_hf_state_dict(cfg, fake)["model"]["layers"]


def params_from_hf_state_dict(config: KimiAudioConfig, sd: Dict[str, np.ndarray]) -> dict:
    tc = config.text_config
    lm = llama_convert.params_from_hf_state_dict(
        # llama converter reads model.* and lm_head
        type(tc)(**{**tc.to_dict(), "tie_word_embeddings": True}), sd
    )
    params = {
        "model": {
            "embed_tokens": lm["model"]["embed_tokens"],
            "layers": lm["model"]["layers"],
            "norm": lm["model"]["norm"],
            "mimo_layers": _stack_llama_layers(
                sd, config.kimia_mimo_layers, "model.mimo_layers."
            ),
            "mimo_norm": {"weight": np.asarray(sd["model.mimo_norm.weight"])},
            "vq_adaptor": {
                "layers": {
                    i: {
                        "weight": np.asarray(sd[f"model.vq_adaptor.layers.{i}.weight"]),
                        "bias": np.asarray(sd[f"model.vq_adaptor.layers.{i}.bias"]),
                    }
                    for i in ("0", "3", "4")
                }
            },
        },
        "speech_encoder": tower_from_hf(
            sd, config.speech_encoder_config.encoder_layers, prefix="speech_encoder."
        ),
        "speech_tokenizer": _vq_from_hf(sd, config),
        "lm_head": {"weight": np.asarray(sd["lm_head.weight"])},
        "mimo_output": {"weight": np.asarray(sd["mimo_output.weight"])},
    }
    return params


def _vq_from_hf(sd, config: KimiAudioConfig) -> dict:
    vq = config.speech_tokenizer_config
    prefix = "speech_tokenizer."
    # the VQ tower has no final layer_norm; synthesize one for tower_from_hf
    # and drop it afterwards
    filtered = {
        k: v for k, v in sd.items()
        if k.startswith(prefix)
        and not k.endswith(("embed_positions2.weight", "codebook.weight"))
        and "ema_" not in k
    }
    D = vq.d_model
    filtered[f"{prefix}layer_norm.weight"] = np.ones(D, np.float32)
    filtered[f"{prefix}layer_norm.bias"] = np.zeros(D, np.float32)
    tower = tower_from_hf(filtered, vq.quantize_position, prefix=prefix)
    tower.pop("layer_norm", None)
    tower["embed_positions2"] = {
        "weight": np.asarray(sd[f"{prefix}embed_positions2.weight"])
    }
    tower["codebook"] = {"weight": np.asarray(sd[f"{prefix}codebook.weight"])}
    return tower


def params_to_hf_state_dict(config: KimiAudioConfig, params: dict) -> Dict[str, np.ndarray]:
    tc = config.text_config
    sd = llama_convert.params_to_hf_state_dict(
        type(tc)(**{**tc.to_dict(), "tie_word_embeddings": True}),
        {"model": {
            "embed_tokens": params["model"]["embed_tokens"],
            "layers": params["model"]["layers"],
            "norm": params["model"]["norm"],
        }},
    )
    # mimo layers via the llama key map with a renamed prefix
    from touchnet_tpu.models.llama.configuration_llama import LlamaConfig

    mimo_cfg = LlamaConfig(
        num_hidden_layers=config.kimia_mimo_layers, tie_word_embeddings=True
    )
    mimo_sd = llama_convert.params_to_hf_state_dict(
        mimo_cfg,
        {"model": {
            "embed_tokens": params["model"]["embed_tokens"],
            "layers": params["model"]["mimo_layers"],
            "norm": params["model"]["mimo_norm"],
        }},
    )
    for k, v in mimo_sd.items():
        if k.startswith("model.layers."):
            sd[k.replace("model.layers.", "model.mimo_layers.", 1)] = v
    sd["model.mimo_norm.weight"] = np.asarray(params["model"]["mimo_norm"]["weight"])
    for i in ("0", "3", "4"):
        sd[f"model.vq_adaptor.layers.{i}.weight"] = np.asarray(
            params["model"]["vq_adaptor"]["layers"][i]["weight"]
        )
        sd[f"model.vq_adaptor.layers.{i}.bias"] = np.asarray(
            params["model"]["vq_adaptor"]["layers"][i]["bias"]
        )
    sd.update(
        tower_to_hf(params["speech_encoder"],
                    config.speech_encoder_config.encoder_layers,
                    prefix="speech_encoder.")
    )
    vq = params["speech_tokenizer"]
    vq_plain = {k: v for k, v in vq.items()
                if k not in ("embed_positions2", "codebook")}
    D = config.speech_tokenizer_config.d_model
    vq_plain["layer_norm"] = {"weight": np.ones(D, np.float32),
                              "bias": np.zeros(D, np.float32)}
    vq_sd = tower_to_hf(vq_plain, config.speech_tokenizer_config.quantize_position,
                        prefix="speech_tokenizer.")
    vq_sd.pop("speech_tokenizer.layer_norm.weight", None)
    vq_sd.pop("speech_tokenizer.layer_norm.bias", None)
    sd.update(vq_sd)
    sd["speech_tokenizer.embed_positions2.weight"] = np.asarray(
        vq["embed_positions2"]["weight"]
    )
    sd["speech_tokenizer.codebook.weight"] = np.asarray(vq["codebook"]["weight"])
    sd["lm_head.weight"] = np.asarray(params["lm_head"]["weight"])
    sd["mimo_output.weight"] = np.asarray(params["mimo_output"]["weight"])
    return sd
