# Copyright (c) 2026 touchnet_tpu authors.
# Trained checkpoint step-N -> HF save_pretrained dir CLI.
#
# Capability parity: reference touchnet/bin/convert_dcp_to_hf.py:28-92 —
# restore the distributed checkpoint, remap to HF layout, load into a fresh
# HF model (strict) and save_pretrained with config/tokenizer, into
# {ckpt_dir}/checkpoint_hf/step-N.

import os

from touchnet_tpu.bin import CkptConverterConfig
from touchnet_tpu.utils.cli import parse_args_into_dataclasses
from touchnet_tpu.utils.logging import init_logger, logger


def restore_model_tree(ckpt_dir: str, step: int, abstract_params):
    import orbax.checkpoint as ocp

    from touchnet_tpu.utils.checkpoint import _abstract, _from_savable

    mgr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(ckpt_dir, "checkpoint")),
        options=ocp.CheckpointManagerOptions(step_prefix="step"),
    )
    result = mgr.restore(
        step,
        args=ocp.args.Composite(
            model=ocp.args.StandardRestore(_abstract(abstract_params))
        ),
    )
    mgr.close()
    return _from_savable(result["model"], abstract_params)


def convert(config: CkptConverterConfig) -> str:
    import jax
    import numpy as np
    import torch

    step = config.step
    if config.model_type == "causal_lm":
        import transformers

        from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
        from touchnet_tpu.models.llama.convert import params_to_hf_state_dict
        from touchnet_tpu.models.llama.modeling_llama import init_params

        mcfg = LlamaConfig.from_json_file(config.training_model_config_path)
        abstract = jax.eval_shape(
            lambda: init_params(mcfg, jax.random.PRNGKey(0))
        )
        abstract = jax.tree.map(
            lambda s: np.zeros(s.shape, s.dtype), abstract
        )
        params = restore_model_tree(config.ckpt_dir, step, abstract)
        sd = params_to_hf_state_dict(mcfg, params)
        hf_cfg = transformers.LlamaConfig(
            vocab_size=mcfg.vocab_size,
            hidden_size=mcfg.hidden_size,
            intermediate_size=mcfg.intermediate_size,
            num_hidden_layers=mcfg.num_hidden_layers,
            num_attention_heads=mcfg.num_attention_heads,
            num_key_value_heads=mcfg.num_key_value_heads,
            max_position_embeddings=mcfg.max_position_embeddings,
            rms_norm_eps=mcfg.rms_norm_eps,
            rope_theta=mcfg.rope_theta,
            tie_word_embeddings=mcfg.tie_word_embeddings,
        )
        model = transformers.LlamaForCausalLM(hf_cfg)
    elif config.model_type in ("touch_audio", "qwen2_audio", "kimi_audio"):
        # audio families export safetensors + config.json directly (the
        # reference round-trips through its own HF-registered classes;
        # writing the same key layout is equivalent output)
        if config.model_type == "touch_audio":
            from touchnet_tpu.models.touch_audio.configuration_touch_audio import (
                TouchAudioConfig as Cfg,
            )
            from touchnet_tpu.models.touch_audio.convert import (
                params_to_hf_state_dict,
            )
            from touchnet_tpu.models.touch_audio.modeling_touch_audio import (
                init_params,
            )
        elif config.model_type == "qwen2_audio":
            from touchnet_tpu.models.qwen2_audio.configuration_qwen2_audio import (
                Qwen2AudioConfig as Cfg,
            )
            from touchnet_tpu.models.qwen2_audio.convert import (
                params_to_hf_state_dict,
            )
            from touchnet_tpu.models.qwen2_audio.modeling_qwen2_audio import (
                init_params,
            )
        else:
            from touchnet_tpu.models.kimi_audio.configuration_kimi_audio import (
                KimiAudioConfig as Cfg,
            )
            from touchnet_tpu.models.kimi_audio.convert import (
                params_to_hf_state_dict,
            )
            from touchnet_tpu.models.kimi_audio.modeling_kimi_audio import (
                init_params,
            )
        mcfg = Cfg.from_json_file(config.training_model_config_path)
        abstract = jax.eval_shape(
            lambda: init_params(mcfg, jax.random.PRNGKey(0))
        )
        abstract = jax.tree.map(lambda s_: np.zeros(s_.shape, s_.dtype), abstract)
        params = restore_model_tree(config.ckpt_dir, step, abstract)
        sd = params_to_hf_state_dict(mcfg, jax.tree.map(np.asarray, params))
        out = os.path.join(config.ckpt_dir, "checkpoint_hf", f"step-{step}")
        os.makedirs(out, exist_ok=True)
        from safetensors.numpy import save_file

        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                  os.path.join(out, "model.safetensors"))
        import json

        with open(os.path.join(out, "config.json"), "w") as f:
            json.dump(mcfg.to_dict(), f, indent=2)
        logger.info(f"HF checkpoint written to {out}")
        return out
    else:
        raise NotImplementedError(f"unknown model_type {config.model_type!r}")

    model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=True
    )
    out = os.path.join(config.ckpt_dir, "checkpoint_hf", f"step-{step}")
    model.save_pretrained(out, safe_serialization=True)
    if config.tokenizer_model:
        import transformers

        tok = transformers.AutoTokenizer.from_pretrained(
            config.tokenizer_model, trust_remote_code=True
        )
        tok.save_pretrained(out)
    logger.info(f"HF checkpoint written to {out}")
    return out


def main(argv=None):
    (config,) = parse_args_into_dataclasses([CkptConverterConfig], argv)
    init_logger()
    assert config.ckpt_dir and config.step is not None
    convert(config)


if __name__ == "__main__":
    main()
