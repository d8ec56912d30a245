# Copyright (c) 2026 touchnet_tpu authors.
# Kimi-Audio family registration.
#
# Capability parity: reference touchnet/models/kimi_audio/__init__.py +
# parallelize_kimi_audio.py:39-41 — FSDP/HSDP/DDP only; AC/compile/FSDP over
# the four stacks (layers, mimo_layers, speech_tokenizer, speech_encoder —
# here: scan + remat + generic FSDP sharding). The frozen WhisperVQ
# tokenizer is excluded from optimizer updates via frozen_params_re.

from touchnet_tpu.data.dataloader import build_dataloader
from touchnet_tpu.loss import accuracy, cross_entropy_loss
from touchnet_tpu.models.kimi_audio.configuration_kimi_audio import KimiAudioConfig
from touchnet_tpu.models.kimi_audio.modeling_kimi_audio import (
    forward,
    get_num_flop_per_token,
    get_num_params,
    init_params,
)
from touchnet_tpu.tokenizer.tokenizer import build_tokenizer
from touchnet_tpu.utils.train_spec import TrainSpec, register_train_spec

register_train_spec(
    TrainSpec(
        name="kimi_audio",
        config_cls=KimiAudioConfig,
        init_params_fn=init_params,
        forward_fn=forward,
        loss_fn=cross_entropy_loss,
        acc_fn=accuracy,
        build_dataloader_fn=build_dataloader,
        build_tokenizer_fn=build_tokenizer,
        get_num_flop_per_token_fn=get_num_flop_per_token,
        get_num_params_fn=get_num_params,
        param_rules=None,
        dp_only=True,
        forward_batch_keys=(
            "text_input_ids",
            "audio_input_ids",
            "whisper_input_features",
            "whisper_attention_mask",
        ),
        frozen_params_re=(r"speech_tokenizer/.*",),
    )
)
