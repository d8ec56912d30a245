# Kimi-Audio tests: dual-stream fusion, mimo fork, frozen VQ tokenizer,
# dynamic batcher, and a train-step smoke with freeze verification.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchnet_tpu.data import DataConfig
from touchnet_tpu.models.kimi_audio.configuration_kimi_audio import KimiAudioConfig
from touchnet_tpu.models.kimi_audio.modeling_kimi_audio import (
    _mask_between_markers,
    forward,
    get_num_params,
    init_params,
    speech_tokenizer_forward,
    vector_quantize,
)
from touchnet_tpu.models.kimi_audio.processing_kimi_audio import dynamic_batch

TINY = {
    "vocab_size": 256,
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 4,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "attn_implementation": "eager",
    "kimia_mimo_layers": 2,
    "kimia_mimo_transformer_from_layer_index": 1,
    "kimia_adaptor_input_dim": 128,  # 4 * whisper d_model
    "kimia_token_offset": 100,
    "kimia_media_begin": 200,
    "kimia_media_end": 201,
    "speech_encoder_config": {
        "num_mel_bins": 16, "d_model": 32, "encoder_layers": 2,
        "encoder_attention_heads": 4, "encoder_ffn_dim": 64,
        "max_source_positions": 100,
    },
    "speech_tokenizer_config": {
        "num_mel_bins": 16, "d_model": 32, "encoder_attention_heads": 4,
        "encoder_ffn_dim": 64, "max_source_positions": 100,
        "pooling_kernel_size": 4, "pooling_position": 2,
        "quantize_position": 2, "quantize_vocab_size": 32,
        "quantize_causal_block_size": 8,
    },
}


@pytest.fixture(scope="module")
def tiny():
    config = KimiAudioConfig.from_dict(TINY)
    params = init_params(config, jax.random.PRNGKey(0))
    return config, params


def test_mask_between_markers():
    ids = np.zeros((2, 10), np.int32)
    ids[0, 2] = 200
    ids[0, 7] = 201
    ids[1, 0] = 200
    ids[1, 4] = 201
    m = np.asarray(_mask_between_markers(jnp.asarray(ids), 200, 201))
    assert m[0].tolist() == [False, False, False, True, True, True, True,
                             False, False, False]
    assert m[1].tolist() == [False, True, True, True, False] + [False] * 5
    # row without markers: all False
    ids2 = np.zeros((1, 5), np.int32)
    m2 = np.asarray(_mask_between_markers(jnp.asarray(ids2), 200, 201))
    assert not m2.any()


def test_vector_quantize_nearest():
    cb = jnp.asarray(np.eye(4, dtype=np.float32) * 2)
    h = jnp.asarray([[[1.9, 0, 0, 0], [0, 0, 0.1, 2.2]]], jnp.float32)
    codes = vector_quantize(h, cb)
    assert codes.tolist() == [[0, 3]]


def test_speech_tokenizer_shapes_and_determinism(tiny):
    config, params = tiny
    vq = config.speech_tokenizer_config
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 64)), jnp.float32
    )
    mask = jnp.ones((2, 64), jnp.int32)
    codes = speech_tokenizer_forward(
        params["speech_tokenizer"], feats, mask, vq, jnp.float32
    )
    assert codes.shape == (2, 8)  # 64 / 2 (conv) / 4 (pool)
    codes2 = speech_tokenizer_forward(
        params["speech_tokenizer"], feats, mask, vq, jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))
    assert int(codes.max()) < vq.quantize_vocab_size


def test_mimo_fork_structure(tiny):
    """Text logits must depend only on all main layers; forked mimo stream
    must equal a manual re-composition (scan split correctness)."""
    config, params = tiny
    B, T = 2, 16
    rng = np.random.default_rng(0)
    audio_ids = rng.integers(0, 90, (B, T)).astype(np.int32)
    text_ids = rng.integers(0, 90, (B, T)).astype(np.int32)
    out = forward(
        params, text_input_ids=jnp.asarray(text_ids),
        audio_input_ids=jnp.asarray(audio_ids),
        config=config, compute_dtype=jnp.float32,
    )
    assert out.shape == (B, T, config.text_config.vocab_size)
    assert np.isfinite(np.asarray(out)).all()
    text_logits, audio_logits = forward(
        params, text_input_ids=jnp.asarray(text_ids),
        audio_input_ids=jnp.asarray(audio_ids),
        config=config, compute_dtype=jnp.float32, return_audio_logits=True,
    )
    np.testing.assert_allclose(np.asarray(text_logits), np.asarray(out))
    assert audio_logits.shape == out.shape


def test_full_forward_with_whisper(tiny):
    config, params = tiny
    B, T = 2, 40
    Tw = 64  # mel frames
    rng = np.random.default_rng(1)
    audio_ids = rng.integers(0, 90, (B, T)).astype(np.int32)
    # media markers around an audio span of Tw//8 = 8 tokens
    audio_ids[:, 4] = config.kimia_media_begin
    audio_ids[:, 13] = config.kimia_media_end
    text_ids = rng.integers(0, 90, (B, T)).astype(np.int32)
    feats = rng.standard_normal((B, 16, Tw)).astype(np.float32)
    mask = np.ones((B, Tw), np.int32)
    out = forward(
        params,
        text_input_ids=jnp.asarray(text_ids),
        audio_input_ids=jnp.asarray(audio_ids),
        whisper_input_features=jnp.asarray(feats),
        whisper_attention_mask=jnp.asarray(mask),
        config=config, compute_dtype=jnp.float32,
    )
    assert out.shape == (B, T, config.text_config.vocab_size)
    assert np.isfinite(np.asarray(out)).all()


class _FakeKimiTokenizer:
    pad = 0
    eos = 2
    SPECIALS = {
        "<|im_kimia_user_msg_start|>": 210,
        "<|im_kimia_assistant_msg_start|>": 211,
        "<|im_kimia_text_blank|>": 212,
        "<|im_kimia_text_eos|>": 213,
        "<|im_media_begin|>": 200,
        "<|im_media_end|>": 201,
        "<|im_kimia_speech_ct_id|>": 214,
        "<|im_msg_end|>": 215,
    }

    def tokenize(self, text, add_special_tokens=False):
        ids = []
        while text:
            for tok_str, tok_id in self.SPECIALS.items():
                if text.startswith(tok_str):
                    ids.append(tok_id)
                    text = text[len(tok_str):]
                    break
            else:
                ids.append(3 + ord(text[0]) % 90)
                text = text[1:]
        return ids


def test_dynamic_batch_dual_streams():
    cfg = DataConfig(dataset_batchsize=1, dataset_text_seqlen=4096,
                     dataloader_drop_last_batch=False,
                     audiofeat_num_mel_bins=16)
    tok = _FakeKimiTokenizer()

    def extract_fn(waveform, sr):
        n = 480  # frames
        return np.zeros((n, 16), np.float32), np.ones(n, np.int32)

    samples = [{"waveform": np.zeros((1, 8000), np.float32), "sample_rate": 16000,
                "txt": "ok"}]
    batches = list(dynamic_batch(iter(samples), cfg, extract_fn, tok))
    assert len(batches) == 1
    b = batches[0]
    # parallel streams have identical length
    assert b["text_input_ids"].shape == b["audio_input_ids"].shape
    # exactly one media_begin / media_end in the audio stream
    assert (b["audio_input_ids"][0] == 200).sum() == 1
    assert (b["audio_input_ids"][0] == 201).sum() == 1
    # span between the markers = num audio tokens = 480/8 = 60
    begin = int(np.argmax(b["audio_input_ids"][0] == 200))
    end = int(np.argmax(b["audio_input_ids"][0] == 201))
    assert end - begin - 1 == 60
    # labels supervise response + kimia_text_eos
    sup = b["labels"][0][b["labels"][0] != -100]
    assert sup[-1] == 213
    assert b["whisper_input_features"].shape[1] == 16  # [B, mel, T]


def test_dynamic_batch_rejects_multiple_media_spans(monkeypatch):
    """The speech merge scatters between ONE <|im_media_begin|>/<|im_media_end|>
    pair per sample (modeling_kimi_audio.py:301-308). The stock templates
    can only produce one pair (instruct/response text is blanked out of the
    audio stream), so the guard is an invariant check — simulate a template
    edit that smuggles in a second span and assert it fails loudly."""
    from touchnet_tpu.models.kimi_audio import processing_kimi_audio as pk

    monkeypatch.setattr(
        pk, "KIMI_AUDIO_TEMPLATE_FOR_S2T",
        pk.KIMI_AUDIO_TEMPLATE_FOR_S2T.replace(
            "<|im_media_end|>",
            "<|im_media_end|><|im_media_begin|><|im_media_end|>",
        ),
    )
    # keep the parallel streams length-aligned (the batcher asserts it)
    monkeypatch.setattr(
        pk, "KIMI_TEXT_TEMPLATE_FOR_S2T",
        pk.KIMI_TEXT_TEMPLATE_FOR_S2T
        + "<|im_kimia_text_blank|><|im_kimia_text_blank|>",
    )
    cfg = DataConfig(dataset_batchsize=1, dataset_text_seqlen=4096,
                     dataloader_drop_last_batch=False,
                     audiofeat_num_mel_bins=16)
    tok = _FakeKimiTokenizer()

    def extract_fn(waveform, sr):
        n = 480
        return np.zeros((n, 16), np.float32), np.ones(n, np.int32)

    samples = [{"waveform": np.zeros((1, 8000), np.float32),
                "sample_rate": 16000, "txt": "ok"}]
    with pytest.raises(ValueError, match="media.*marker"):
        list(pk.dynamic_batch(iter(samples), cfg, extract_fn, tok))


def test_kimi_audio_datapipe_end_to_end(tmp_path):
    """Drive the REAL runtime surface: scipy wavs -> make_data shards ->
    kimi_audio_datapipe (LowLevel -> whisper_features -> dynamic_batch) —
    the dual-stream batch comes out of the same builder build_dataloader
    dispatches to (data/dataloader.py)."""
    import json

    from scipy.io import wavfile

    from touchnet_tpu.bin.make_data import main as make_data_main
    from touchnet_tpu.models.kimi_audio.processing_kimi_audio import (
        kimi_audio_datapipe,
    )

    rng = np.random.default_rng(0)
    jsonl = tmp_path / "data.jsonl"
    with open(jsonl, "w") as f:
        wav = (rng.standard_normal(16000) * 5000).astype(np.int16)
        wavfile.write(tmp_path / "utt0.wav", 16000, wav)
        f.write(json.dumps({"key": "utt0", "wav": str(tmp_path / "utt0.wav"),
                            "txt": "ok"}) + "\n")
    save_dir = tmp_path / "shards"
    make_data_main([
        "--save_dir", str(save_dir), "--jsonl_path", str(jsonl),
        "--num_utt_per_shard", "2", "--num_workers", "1",
        "--datatypes", "audio+metainfo",
    ])

    cfg = DataConfig(
        datalist_path=str(save_dir / "data.list"),
        datalist_shuffling=False, dataset_shuffling=False, datalist_epoch=1,
        dataset_batchsize=1, dataset_text_seqlen=4096,
        dataloader_drop_last_batch=False, audiofeat_num_mel_bins=16,
    )
    batches = list(kimi_audio_datapipe(cfg, _FakeKimiTokenizer(), 0, 1))
    assert len(batches) == 1
    b = batches[0]
    assert b["text_input_ids"].shape == b["audio_input_ids"].shape
    assert (b["audio_input_ids"][0] == 200).sum() == 1  # one media span
    assert b["whisper_input_features"].shape[1] == 16  # [B, mel, T]


def test_dynamic_batch_rejects_multi_id_media_markers():
    """A tokenizer that splits <|im_media_begin|>/<|im_media_end|> into
    several ids can never emit the single marker ids the model's span
    locator matches (config.kimia_media_begin/end) — the batcher must
    reject that tokenizer at setup instead of silently producing batches
    whose speech merge scatters nowhere."""
    from touchnet_tpu.models.kimi_audio import processing_kimi_audio as pk

    class _SplitMarkerTokenizer(_FakeKimiTokenizer):
        SPECIALS = {k: v for k, v in _FakeKimiTokenizer.SPECIALS.items()
                    if k != "<|im_media_begin|>"}  # begin falls to chars

    cfg = DataConfig(dataset_batchsize=1, dataset_text_seqlen=4096,
                     dataloader_drop_last_batch=False,
                     audiofeat_num_mel_bins=16)

    def extract_fn(waveform, sr):
        n = 480
        return np.zeros((n, 16), np.float32), np.ones(n, np.int32)

    samples = [{"waveform": np.zeros((1, 8000), np.float32),
                "sample_rate": 16000, "txt": "ok"}]
    with pytest.raises(ValueError, match="tokenize to one"):
        list(pk.dynamic_batch(iter(samples), cfg, extract_fn,
                              _SplitMarkerTokenizer()))


@pytest.mark.slow
def test_train_step_freezes_tokenizer(tiny):
    import optax

    from touchnet_tpu.loss import cross_entropy_loss

    config, params = tiny
    B, T, Tw = 2, 24, 64
    rng = np.random.default_rng(0)
    audio_ids = rng.integers(0, 90, (B, T)).astype(np.int32)
    audio_ids[:, 2] = config.kimia_media_begin
    audio_ids[:, 11] = config.kimia_media_end
    text_ids = rng.integers(0, 90, (B, T)).astype(np.int32)
    feats = rng.standard_normal((B, 16, Tw)).astype(np.float32)
    fmask = np.ones((B, Tw), np.int32)
    labels = rng.integers(0, 90, (B, T)).astype(np.int32)
    slens = np.full((B, T), 8, np.int32)

    tx = optax.adamw(1e-2, weight_decay=0.1)
    opt_state = tx.init(params)

    import re

    from touchnet_tpu.parallel.sharding import _path_str

    frozen = re.compile(r"speech_tokenizer/.*")

    def loss_fn(p):
        logits = forward(
            p, text_input_ids=jnp.asarray(text_ids),
            audio_input_ids=jnp.asarray(audio_ids),
            whisper_input_features=jnp.asarray(feats),
            whisper_attention_mask=jnp.asarray(fmask),
            config=config, compute_dtype=jnp.float32,
        )
        loss, _ = cross_entropy_loss(
            logits, jnp.asarray(labels), jnp.asarray(slens), jnp.asarray(2.0)
        )
        return loss

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        grads = jax.tree_util.tree_map_with_path(
            lambda pth, g: jnp.zeros_like(g) if frozen.match(_path_str(pth)) else g,
            grads,
        )
        updates, s = tx.update(grads, s, p)
        updates = jax.tree_util.tree_map_with_path(
            lambda pth, u: jnp.zeros_like(u) if frozen.match(_path_str(pth)) else u,
            updates,
        )
        return optax.apply_updates(p, updates), s, loss

    new_params, _, loss = step(params, opt_state)
    assert np.isfinite(float(loss))
    # frozen tokenizer unchanged, trainable weights changed
    for a, b in zip(jax.tree.leaves(params["speech_tokenizer"]),
                    jax.tree.leaves(new_params["speech_tokenizer"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(
        np.asarray(params["lm_head"]["weight"]),
        np.asarray(new_params["lm_head"]["weight"]),
    )


def test_num_params_formula(tiny):
    config, params = tiny
    counted = sum(x.size for x in jax.tree.leaves(params))
    # exclude frozen buffers not in the formula: the two whisper pos tables
    # (speech_encoder sinusoids, tokenizer pos tables are learned... counted)
    expected = get_num_params(config)
    pos_tables = (
        config.speech_encoder_config.max_source_positions
        * config.speech_encoder_config.d_model
        + config.speech_tokenizer_config.max_source_positions
        * config.speech_tokenizer_config.d_model
        + -(-config.speech_tokenizer_config.max_source_positions
            // config.speech_tokenizer_config.pooling_kernel_size)
        * config.speech_tokenizer_config.d_model
    )
    assert counted == expected + pos_tables, (counted, expected, pos_tables)


def test_dual_stream_generate_text_matches_single_stream(tiny):
    """output_type='text' dual-stream decode must reproduce the single-
    stream ASR generate path exactly (greedy): the mimo stream never feeds
    back when the audio token is blanked."""
    from touchnet_tpu.models.kimi_audio.generate_kimi_audio import generate_dual
    from touchnet_tpu.models.llama.inference_llama import generate

    config, params = tiny
    blank_id, eos_id = 7, 9
    B, Tp = 2, 12
    rng = np.random.default_rng(0)
    embed_w = params["model"]["embed_tokens"]["weight"]
    prompt_ids = jnp.asarray(
        rng.integers(10, 90, size=(B, Tp), dtype=np.int32)
    )
    prompt = jnp.take(embed_w, prompt_ids, axis=0)
    plen = jnp.asarray([Tp, Tp - 3], jnp.int32)

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
        return jnp.take(embed_w, toks, axis=0) + blank_emb[None]

    single = generate(
        lm_params, config.text_config, prompt + blank_emb[None, None],
        plen, 6, eos_id=eos_id, embed_fn=embed_fn,
        temperature=0.0, compute_dtype=jnp.float32,
    )
    # neutral sampler: generate_dual's DEFAULT carries the reference's
    # text repetition penalty 1.1, which the plain single-stream call
    # above does not — this test pins the pure decode-path equivalence
    from touchnet_tpu.models.kimi_audio.generate_kimi_audio import (
        SamplerSettings,
    )

    text, audio = generate_dual(
        params, config, prompt + blank_emb[None, None], plen, 6,
        blank_id=blank_id, eos_id=eos_id, output_type="text",
        text_sampler=SamplerSettings(),
        compute_dtype=jnp.float32,
    )
    # single-stream pads with eos after finish; dual pads with blank —
    # compare up to each row's first eos
    s, t = np.asarray(single), np.asarray(text)
    for b in range(B):
        n = (s[b] == eos_id).argmax() + 1 if (s[b] == eos_id).any() else s.shape[1]
        np.testing.assert_array_equal(t[b, :n], s[b, :n])
    assert (np.asarray(audio) == blank_id).all()


def test_dual_stream_generate_audio_after_delay(tiny):
    """output_type='both': audio stream is blank during the delay ramp and
    sampled from the mimo head afterwards."""
    from touchnet_tpu.models.kimi_audio.generate_kimi_audio import generate_dual

    config, params = tiny
    blank_id, eos_id = 7, 251  # eos the greedy path will rarely emit
    B, Tp, N = 2, 8, 8
    rng = np.random.default_rng(1)
    embed_w = params["model"]["embed_tokens"]["weight"]
    prompt = jnp.take(
        embed_w,
        jnp.asarray(rng.integers(10, 90, size=(B, Tp), dtype=np.int32)),
        axis=0,
    )
    plen = jnp.asarray([Tp, Tp], jnp.int32)
    delay = 3
    text, audio = generate_dual(
        params, config, prompt, plen, N,
        blank_id=blank_id, eos_id=eos_id, output_type="both",
        audio_delay_tokens=delay, compute_dtype=jnp.float32,
    )
    audio = np.asarray(audio)
    assert (audio[:, :delay] == blank_id).all()
    # generate_dual's default audio sampler (temperature 0.8 / top-k 10,
    # fixed seed) over a random-init mimo head essentially never lands
    # exactly on blank for every post-delay step
    assert (audio[:, delay:] != blank_id).any()
    assert np.asarray(text).shape == (B, N)


def test_dual_stream_chunked_prefill_matches_single_shot(tiny):
    """prefill_chunk on the dual-stream decode must reproduce the
    single-shot prefill exactly (both text and audio streams)."""
    from touchnet_tpu.models.kimi_audio.generate_kimi_audio import generate_dual

    config, params = tiny
    blank_id, eos_id = 7, 9
    B, Tp = 2, 13  # pads to 3 chunks of 5
    rng = np.random.default_rng(1)
    embed_w = params["model"]["embed_tokens"]["weight"]
    prompt = jnp.take(
        embed_w,
        jnp.asarray(rng.integers(10, 90, size=(B, Tp), dtype=np.int32)),
        axis=0,
    )
    plen = jnp.asarray([Tp, Tp - 4], jnp.int32)
    want = generate_dual(
        params, config, prompt, plen, 6,
        blank_id=blank_id, eos_id=eos_id, output_type="both",
        compute_dtype=jnp.float32,
    )
    got = generate_dual(
        params, config, prompt, plen, 6,
        blank_id=blank_id, eos_id=eos_id, output_type="both",
        compute_dtype=jnp.float32, prefill_chunk=5,
    )
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
