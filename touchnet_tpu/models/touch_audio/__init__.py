# Copyright (c) 2026 touchnet_tpu authors.
# TouchAudio (LlamaForASR / TouchAudioForCausalLM) family registration.
#
# Capability parity: reference touchnet/models/touch_audio/__init__.py and
# the spec registration in touchnet/__init__.py. Parallelism: FSDP/HSDP/DDP +
# TP/SP (projector included, rowwise) + CP — same as the reference
# parallelize_touch_audio.py plan; the projector rule lives in
# parallel/sharding.py LLAMA_PARAM_RULES (matched under language_model/*).

from touchnet_tpu.data.dataloader import build_dataloader
from touchnet_tpu.loss import accuracy, cross_entropy_loss
from touchnet_tpu.models.touch_audio.configuration_touch_audio import (
    TouchAudioConfig,
)
from touchnet_tpu.models.touch_audio.modeling_touch_audio import (
    forward,
    get_num_flop_per_token,
    get_num_params,
    init_params,
)
from touchnet_tpu.parallel.sharding import LLAMA_PARAM_RULES
from touchnet_tpu.tokenizer.tokenizer import build_tokenizer
from touchnet_tpu.utils.train_spec import TrainSpec, register_train_spec

# the llama rules match nested language_model/* paths because matching is on
# the trailing components (regexes use .* prefixes); projector has its own rule
TOUCH_AUDIO_PARAM_RULES = LLAMA_PARAM_RULES + [
    (r"language_model/model/embed_tokens/weight", LLAMA_PARAM_RULES[0][1]),
    (r"language_model/lm_head/weight", LLAMA_PARAM_RULES[1][1]),
    (r"language_model/model/norm/weight", LLAMA_PARAM_RULES[3][1]),
]

def head_weight(params: dict, config: TouchAudioConfig):
    from touchnet_tpu.models.llama import head_weight as llama_head_weight

    return llama_head_weight(params["language_model"], config.text_config)


register_train_spec(
    TrainSpec(
        name="touch_audio",
        config_cls=TouchAudioConfig,
        init_params_fn=init_params,
        forward_fn=forward,
        loss_fn=cross_entropy_loss,
        acc_fn=accuracy,
        build_dataloader_fn=build_dataloader,
        build_tokenizer_fn=build_tokenizer,
        get_num_flop_per_token_fn=get_num_flop_per_token,
        get_num_params_fn=get_num_params,
        param_rules=TOUCH_AUDIO_PARAM_RULES,
        head_weight_fn=head_weight,
        forward_batch_keys=("input_ids", "inputs_embeds", "input_features"),
        # BEYOND reference parity: the reference pipelines only llama —
        # here the projector fusion runs outside the tick loop, so the
        # backbone pipelines unchanged (pipeline_touch_audio.py)
        pipelining_fn=(
            "touchnet_tpu.models.touch_audio.pipeline_touch_audio"
            ".pipeline_forward"
        ),
    )
)
