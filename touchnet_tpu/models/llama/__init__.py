# Copyright (c) 2026 touchnet_tpu authors.
# Llama model family registration.
#
# Capability parity: reference touchnet/models/llama/__init__.py:11-67 and
# the TrainSpec registration in touchnet/__init__.py:35-117. The liger
# pre-init hook becomes a no-op (XLA fuses what liger fuses); the post-init
# NaN check is kept.

import jax.numpy as jnp

from touchnet_tpu.data.dataloader import build_dataloader
from touchnet_tpu.loss import accuracy, cross_entropy_loss
from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
from touchnet_tpu.models.llama.modeling_llama import (
    forward,
    get_num_flop_per_token,
    get_num_params,
    init_params,
)
from touchnet_tpu.parallel.sharding import LLAMA_PARAM_RULES
from touchnet_tpu.tokenizer.tokenizer import build_tokenizer
from touchnet_tpu.utils.train_spec import TrainSpec, register_train_spec


def check_finite_params(params) -> None:
    """NaN/inf guard after init/load (reference llama/__init__.py:34-36)."""
    import jax

    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if not bool(jnp.isfinite(leaf).all()):
            from touchnet_tpu.parallel.sharding import _path_str

            raise ValueError(f"non-finite values in param {_path_str(path)}")


def head_weight(params: dict, config: LlamaConfig):
    """lm_head weight [V, E] for the fused linear+CE path."""
    if config.tie_word_embeddings:
        return params["model"]["embed_tokens"]["weight"]
    return params["lm_head"]["weight"]


register_train_spec(
    TrainSpec(
        name="llama",
        config_cls=LlamaConfig,
        init_params_fn=init_params,
        forward_fn=forward,
        loss_fn=cross_entropy_loss,
        acc_fn=accuracy,
        build_dataloader_fn=build_dataloader,
        build_tokenizer_fn=build_tokenizer,
        get_num_flop_per_token_fn=get_num_flop_per_token,
        get_num_params_fn=get_num_params,
        param_rules=LLAMA_PARAM_RULES,
        head_weight_fn=head_weight,
        additional_post_init_fn=None,
        pipelining_fn="touchnet_tpu.models.llama.pipeline_llama.pipeline_forward",
    )
)
