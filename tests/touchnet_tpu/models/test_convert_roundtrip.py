# HF state-dict round trips for the audio families: params -> HF keys ->
# params must be exact (weight-layout compatibility with HF checkpoints).

import jax
import numpy as np

from touchnet_tpu.models.kimi_audio.configuration_kimi_audio import KimiAudioConfig
from touchnet_tpu.models.kimi_audio import convert as kimi_convert
from touchnet_tpu.models.kimi_audio.modeling_kimi_audio import (
    init_params as kimi_init,
)
from touchnet_tpu.models.qwen2_audio.configuration_qwen2_audio import (
    Qwen2AudioConfig,
)
from touchnet_tpu.models.qwen2_audio import convert as q2_convert
from touchnet_tpu.models.qwen2_audio.modeling_qwen2_audio import (
    init_params as q2_init,
)
from touchnet_tpu.models.touch_audio.configuration_touch_audio import (
    TouchAudioConfig,
)
from touchnet_tpu.models.touch_audio import convert as ta_convert
from touchnet_tpu.models.touch_audio.modeling_touch_audio import (
    init_params as ta_init,
)

Q2_TINY = {
    "audio_token_index": 60,
    "audio_config": {"num_mel_bins": 16, "d_model": 32, "encoder_layers": 2,
                     "encoder_attention_heads": 4, "encoder_ffn_dim": 64,
                     "max_source_positions": 50},
    "text_config": {"vocab_size": 64, "hidden_size": 32,
                    "intermediate_size": 64, "num_hidden_layers": 2,
                    "num_attention_heads": 4, "num_key_value_heads": 2,
                    "attention_bias": True},
}
KIMI_TINY = {
    "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 3, "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "kimia_mimo_layers": 2, "kimia_mimo_transformer_from_layer_index": 1,
    "kimia_adaptor_input_dim": 64,
    "speech_encoder_config": {"num_mel_bins": 16, "d_model": 16,
                              "encoder_layers": 2,
                              "encoder_attention_heads": 2,
                              "encoder_ffn_dim": 32,
                              "max_source_positions": 40},
    "speech_tokenizer_config": {"num_mel_bins": 16, "d_model": 16,
                                "encoder_attention_heads": 2,
                                "encoder_ffn_dim": 32,
                                "max_source_positions": 40,
                                "pooling_kernel_size": 4,
                                "quantize_position": 2,
                                "pooling_position": 2,
                                "quantize_vocab_size": 16},
}


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    lb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    for path, leaf in la:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(lb[key]), err_msg=key
        )
    assert len(la) == len(lb)


def test_qwen2_audio_roundtrip():
    cfg = Qwen2AudioConfig.from_dict(Q2_TINY)
    params = jax.tree.map(np.asarray, q2_init(cfg, jax.random.PRNGKey(0)))
    sd = q2_convert.params_to_hf_state_dict(cfg, params)
    back = q2_convert.params_from_hf_state_dict(cfg, sd)
    _assert_tree_equal(params, back)


def test_kimi_audio_roundtrip():
    cfg = KimiAudioConfig.from_dict(KIMI_TINY)
    params = jax.tree.map(np.asarray, kimi_init(cfg, jax.random.PRNGKey(0)))
    sd = kimi_convert.params_to_hf_state_dict(cfg, params)
    back = kimi_convert.params_from_hf_state_dict(cfg, sd)
    _assert_tree_equal(params, back)


def test_touch_audio_roundtrip():
    cfg = TouchAudioConfig.from_dict({
        "audio_config": {"input_size": 8},
        "text_config": {"vocab_size": 32, "hidden_size": 16,
                        "intermediate_size": 32, "num_hidden_layers": 2,
                        "num_attention_heads": 2, "num_key_value_heads": 2},
    })
    params = jax.tree.map(np.asarray, ta_init(cfg, jax.random.PRNGKey(0)))
    sd = ta_convert.params_to_hf_state_dict(cfg, params)
    back = ta_convert.params_from_hf_state_dict(cfg, sd)
    _assert_tree_equal(params, back)
