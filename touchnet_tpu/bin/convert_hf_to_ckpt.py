# Copyright (c) 2026 touchnet_tpu authors.
# HF pretrained -> seed checkpoint (step-0, model-only) CLI.
#
# Capability parity: reference touchnet/bin/convert_hf_to_dcp.py:24-66 —
# load an HF model dir, remap to the framework layout (touch_audio: prefix
# backbone keys with language_model. and inject a fresh projector), write the
# distributed checkpoint at {ckpt_dir}/checkpoint/step-0 that train.py's
# ckpt_load_step=0 consumes as a model-only seed.

import os
from typing import Dict

import numpy as np

from touchnet_tpu.bin import CkptConverterConfig
from touchnet_tpu.utils.cli import parse_args_into_dataclasses
from touchnet_tpu.utils.logging import init_logger, logger


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read every tensor of an HF checkpoint dir (safetensors preferred,
    torch .bin fallback) as float32 numpy."""
    import glob
    import json

    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(f, framework="np") as reader:
                for key in reader.keys():
                    t = reader.get_tensor(key)
                    if t.dtype not in (np.float32, np.int64, np.int32):
                        t = t.astype(np.float32)
                    sd[key] = t
        return sd
    bin_files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if bin_files:
        import torch

        for f in bin_files:
            for k, v in torch.load(f, map_location="cpu", weights_only=True).items():
                sd[k] = v.to(torch.float32).numpy()
        return sd
    raise FileNotFoundError(f"no safetensors/bin weights under {path}")


def convert(config: CkptConverterConfig) -> str:
    from touchnet_tpu.utils.checkpoint import _to_savable  # canonical layout

    sd = load_hf_state_dict(config.huggingface_model)
    model_type = config.model_type

    if model_type == "causal_lm":
        from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
        from touchnet_tpu.models.llama.convert import params_from_hf_state_dict

        mcfg = LlamaConfig.from_json_file(
            config.training_model_config_path
            or os.path.join(config.huggingface_model, "config.json")
        )
        params = params_from_hf_state_dict(mcfg, sd)
    elif model_type == "touch_audio":
        from touchnet_tpu.models.touch_audio.configuration_touch_audio import (
            TouchAudioConfig,
        )
        from touchnet_tpu.models.touch_audio.convert import (
            params_from_hf_backbone_state_dict,
        )

        mcfg = TouchAudioConfig.from_json_file(config.training_model_config_path)
        params = params_from_hf_backbone_state_dict(mcfg, sd)
    elif model_type == "qwen2_audio":
        from touchnet_tpu.models.qwen2_audio.configuration_qwen2_audio import (
            Qwen2AudioConfig,
        )
        from touchnet_tpu.models.qwen2_audio.convert import params_from_hf_state_dict

        mcfg = Qwen2AudioConfig.from_json_file(
            config.training_model_config_path
            or os.path.join(config.huggingface_model, "config.json")
        )
        params = params_from_hf_state_dict(mcfg, sd)
    elif model_type == "kimi_audio":
        from touchnet_tpu.models.kimi_audio.configuration_kimi_audio import (
            KimiAudioConfig,
        )
        from touchnet_tpu.models.kimi_audio.convert import params_from_hf_state_dict

        mcfg = KimiAudioConfig.from_json_file(
            config.training_model_config_path
            or os.path.join(config.huggingface_model, "config.json")
        )
        params = params_from_hf_state_dict(mcfg, sd)
    else:
        raise NotImplementedError(f"model_type {model_type!r}")

    import orbax.checkpoint as ocp

    out_dir = os.path.abspath(os.path.join(config.ckpt_dir, "checkpoint"))
    os.makedirs(out_dir, exist_ok=True)
    mgr = ocp.CheckpointManager(
        out_dir, options=ocp.CheckpointManagerOptions(step_prefix="step", create=True)
    )
    mgr.save(
        0,
        args=ocp.args.Composite(model=ocp.args.StandardSave(_to_savable(params))),
        force=True,
    )
    mgr.wait_until_finished()
    mgr.close()
    logger.info(f"seed checkpoint written to {out_dir}/step-0")
    return out_dir


def main(argv=None):
    (config,) = parse_args_into_dataclasses([CkptConverterConfig], argv)
    init_logger()
    assert config.huggingface_model and config.ckpt_dir
    convert(config)


if __name__ == "__main__":
    main()
