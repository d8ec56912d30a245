# TouchAudio parity + batcher semantics tests.

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchnet_tpu.data import DataConfig
from touchnet_tpu.models.touch_audio.configuration_touch_audio import TouchAudioConfig
from touchnet_tpu.models.touch_audio.modeling_touch_audio import (
    forward,
    get_num_params,
    init_params,
)
from touchnet_tpu.models.touch_audio.processing_touch_audio import (
    batch_audio_packed,
    batch_pairaudio_pairtext_packed,
)

CFG = os.path.join(
    os.path.dirname(__file__), "..", "..", "assets", "config",
    "tiny_touch_audio.json",
)


@pytest.fixture(scope="module")
def tiny():
    config = TouchAudioConfig.from_json_file(CFG)
    params = init_params(config, jax.random.PRNGKey(0))
    return config, params


def test_fusion_matches_torch_reference(tiny):
    """projector(features) + embed_tokens(ids) through the backbone must
    equal the same computation done in torch with HF LlamaForCausalLM."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_llama import _to_hf_state_dict

    config, params = tiny
    tc = config.text_config
    hf_cfg = transformers.LlamaConfig(
        vocab_size=tc.vocab_size, hidden_size=tc.hidden_size,
        intermediate_size=tc.intermediate_size,
        num_hidden_layers=tc.num_hidden_layers,
        num_attention_heads=tc.num_attention_heads,
        num_key_value_heads=tc.num_key_value_heads,
        rms_norm_eps=tc.rms_norm_eps, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    model.load_state_dict(_to_hf_state_dict(params["language_model"], tc), strict=True)

    B, T = 2, 48
    ids = np.random.default_rng(0).integers(0, tc.vocab_size, (B, T))
    feats = np.random.default_rng(1).standard_normal(
        (B, T, config.audio_config.input_size)
    ).astype(np.float32)
    # text in the second half only; audio in the first half only
    ids[:, : T // 2] = 0
    feats[:, T // 2:] = 0.0

    proj_w = torch.from_numpy(np.asarray(params["projector"]["weight"]))
    with torch.no_grad():
        emb = model.model.embed_tokens(torch.from_numpy(ids))
        emb = emb + torch.from_numpy(feats) @ proj_w.T
        want = model(inputs_embeds=emb).logits.numpy()

    got = forward(
        params,
        input_ids=jnp.asarray(ids, jnp.int32),
        input_features=jnp.asarray(feats),
        config=config,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=3e-4)


def test_num_params(tiny):
    config, params = tiny
    assert sum(x.size for x in jax.tree.leaves(params)) == get_num_params(config)


class _FakeBestRQ:
    """Deterministic stand-in: code = argmax over first 8 feat dims."""

    def tokenize(self, feats):
        return list(np.argmax(np.asarray(feats)[:, :8], axis=-1))


def test_batch_audio_packed_semantics():
    cfg = DataConfig(
        dataset_batchsize=1, dataset_audio_seqlen=16,
        audiofeat_num_mel_bins=4, audiofeat_stack_length=2,
    )
    feats = [np.random.default_rng(i).standard_normal((6, 8)).astype(np.float32)
             for i in range(2)]
    stream = iter([{"audiofeat": f} for f in feats])
    batches = list(batch_audio_packed(stream, cfg, _FakeBestRQ()))
    # 6 + 6 = 12 <= 16: both fit in one row; batch only yields at overflow,
    # so with drop_last=True nothing is emitted -> use drop_last False
    cfg.dataloader_drop_last_batch = False
    stream = iter([{"audiofeat": f} for f in feats])
    batches = list(batch_audio_packed(stream, cfg, _FakeBestRQ()))
    assert len(batches) == 1
    b = batches[0]
    assert b["num_sentence"] == 2
    np.testing.assert_array_equal(b["attention_mask"][0, :12],
                                  [1] * 6 + [2] * 6)
    np.testing.assert_array_equal(b["position_ids"][0, :12],
                                  list(range(6)) + list(range(6)))
    # labels are next-code with last ignored
    codes0 = _FakeBestRQ().tokenize(feats[0])
    np.testing.assert_array_equal(b["labels"][0, :6], codes0[1:] + [-100])
    np.testing.assert_array_equal(b["input_features"][0, :6], feats[0])
    assert (b["attention_mask"][0, 12:] == 0).all()


class _FakeTextTok:
    bos, eos, pad = 1, 2, 0


def test_batch_pairaudio_pairtext_packed_semantics():
    cfg = DataConfig(
        dataset_batchsize=1, dataset_audio_seqlen=20, dataset_text_seqlen=20,
        audiofeat_num_mel_bins=4, audiofeat_stack_length=2,
        dataloader_drop_last_batch=False,
    )
    feat = np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32)
    sample = {"audiofeat": feat, "input_ids": [10, 11, 12]}
    batches = list(
        batch_pairaudio_pairtext_packed(iter([sample]), cfg, _FakeTextTok())
    )
    assert len(batches) == 1
    b = batches[0]
    # span = 5 audio + 4 text (bos + 3 ids)
    np.testing.assert_array_equal(b["input_features"][0, :5], feat)
    np.testing.assert_array_equal(b["input_ids"][0, 5:9], [1, 10, 11, 12])
    np.testing.assert_array_equal(b["labels"][0, 5:9], [10, 11, 12, 2])
    assert (b["labels"][0, :5] == -100).all()  # audio span: no loss
    np.testing.assert_array_equal(b["position_ids"][0, :9], np.arange(9))
    np.testing.assert_array_equal(b["attention_mask"][0, :9], [1] * 9)
    np.testing.assert_array_equal(b["sentence_lens"][0, :9], [4] * 9)
    assert b["num_sentence"] == 1
