# Copyright (c) 2026 touchnet_tpu authors.
# Qwen2-Audio family registration.
#
# Capability parity: reference touchnet/models/qwen2_audio/__init__.py +
# parallelize_qwen2_audio.py:38-40 — FSDP/HSDP/DDP only (dp_only), AC +
# compile on language model and audio tower (scan + remat here).

from touchnet_tpu.data.dataloader import build_dataloader
from touchnet_tpu.loss import accuracy, cross_entropy_loss
from touchnet_tpu.models.qwen2_audio.configuration_qwen2_audio import (
    Qwen2AudioConfig,
)
from touchnet_tpu.models.qwen2_audio.modeling_qwen2_audio import (
    forward,
    get_num_flop_per_token,
    get_num_params,
    init_params,
)
from touchnet_tpu.tokenizer.tokenizer import build_tokenizer
from touchnet_tpu.utils.train_spec import TrainSpec, register_train_spec

register_train_spec(
    TrainSpec(
        name="qwen2_audio",
        config_cls=Qwen2AudioConfig,
        init_params_fn=init_params,
        forward_fn=forward,
        loss_fn=cross_entropy_loss,
        acc_fn=accuracy,
        build_dataloader_fn=build_dataloader,
        build_tokenizer_fn=build_tokenizer,
        get_num_flop_per_token_fn=get_num_flop_per_token,
        get_num_params_fn=get_num_params,
        param_rules=None,  # FSDP-only: default rules degrade to replicate+fsdp
        dp_only=True,
        forward_batch_keys=(
            "input_ids", "inputs_embeds", "input_features",
            "feature_attention_mask",
        ),
    )
)
