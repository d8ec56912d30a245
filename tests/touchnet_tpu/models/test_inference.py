# KV-cache generation: greedy decode must match HF transformers generate on
# the tiny llama with identical weights.

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
from touchnet_tpu.models.llama.inference_llama import (
    forward_step,
    generate,
    init_cache,
    sample_token,
)
from touchnet_tpu.models.llama.modeling_llama import forward, init_params

CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "assets", "config", "tiny_llama.json"
)


@pytest.fixture(scope="module")
def tiny():
    config = LlamaConfig.from_json_file(CFG_PATH)
    params = init_params(config, jax.random.PRNGKey(0))
    return config, params


def test_prefill_matches_forward(tiny):
    config, params = tiny
    B, T = 2, 24
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, config.vocab_size)
    want = forward(params, input_ids=ids, config=config, compute_dtype=jnp.float32)
    emb = jnp.take(params["model"]["embed_tokens"]["weight"], ids, axis=0)
    cache = init_cache(config, B, T, jnp.float32)
    got, _ = forward_step(
        params, emb, cache, jnp.zeros((B,), jnp.int32), config, jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_greedy_matches_hf_generate(tiny):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    sys.path.insert(0, os.path.dirname(__file__))
    from test_llama import _to_hf_state_dict

    config, params = tiny
    hf_cfg = transformers.LlamaConfig(
        vocab_size=config.vocab_size, hidden_size=config.hidden_size,
        intermediate_size=config.intermediate_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        num_key_value_heads=config.num_key_value_heads,
        rms_norm_eps=config.rms_norm_eps, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    model.load_state_dict(_to_hf_state_dict(params, config), strict=True)
    model.generation_config.pad_token_id = 0

    B, T, NEW = 1, 12, 8
    ids = np.asarray(
        jax.random.randint(jax.random.PRNGKey(3), (B, T), 3, config.vocab_size)
    )
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(ids), max_new_tokens=NEW, do_sample=False,
            eos_token_id=-1,
        )[:, T:].numpy()

    emb = jnp.take(params["model"]["embed_tokens"]["weight"],
                   jnp.asarray(ids), axis=0)
    got = generate(
        params, config, emb, jnp.full((B,), T, jnp.int32), NEW,
        eos_id=-1, compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), hf_out)


def test_no_repeat_ngram_matches_hf_generate(tiny):
    """no_repeat_ngram_size=2 must reproduce HF generate's banned-bigram
    greedy search. HF is driven through inputs_embeds, the mode the ASR
    CLIs use (prompt = fused audio embeddings, no prompt token ids) — there
    HF's NoRepeatNGramLogitsProcessor sees only the generated ids, which is
    exactly this implementation's semantics. Greedy decode on a tiny random
    model cycles within a few steps, so the ban provably bites."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    sys.path.insert(0, os.path.dirname(__file__))
    from test_llama import _to_hf_state_dict

    config, params = tiny
    hf_cfg = transformers.LlamaConfig(
        vocab_size=config.vocab_size, hidden_size=config.hidden_size,
        intermediate_size=config.intermediate_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        num_key_value_heads=config.num_key_value_heads,
        rms_norm_eps=config.rms_norm_eps, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    model.load_state_dict(_to_hf_state_dict(params, config), strict=True)
    model.generation_config.pad_token_id = 0

    B, T, NEW = 2, 10, 16
    ids = np.asarray(
        jax.random.randint(jax.random.PRNGKey(9), (B, T), 3, config.vocab_size)
    )
    emb_np = np.asarray(
        jnp.take(params["model"]["embed_tokens"]["weight"],
                 jnp.asarray(ids), axis=0)
    )
    with torch.no_grad():
        hf_out = model.generate(
            inputs_embeds=torch.from_numpy(emb_np), max_new_tokens=NEW,
            do_sample=False, no_repeat_ngram_size=2, eos_token_id=-1,
        ).numpy()

    got = generate(
        params, config, jnp.asarray(emb_np), jnp.full((B,), T, jnp.int32),
        NEW, eos_id=-1, compute_dtype=jnp.float32, no_repeat_ngram_size=2,
    )
    got = np.asarray(got)
    np.testing.assert_array_equal(got, hf_out)
    # the ban actually fired: the unbanned greedy decode differs
    plain = np.asarray(generate(
        params, config, jnp.asarray(emb_np), jnp.full((B,), T, jnp.int32),
        NEW, eos_id=-1, compute_dtype=jnp.float32,
    ))
    assert not np.array_equal(got, plain)
    # and no generated row repeats a bigram
    for row in got:
        bigrams = list(zip(row[:-1], row[1:]))
        assert len(bigrams) == len(set(bigrams))

    # the reference's full ASR decode config: penalty 1.5 + bigram ban,
    # both active under greedy search (HF logits PROCESSORS, not warpers —
    # reference touchnet/models/touch_audio/inference_touch_audio.py:177-186).
    # repetition_window >= max_new_tokens makes the windowed penalty cover
    # the full generated history, matching HF's inputs_embeds mode.
    with torch.no_grad():
        hf_pen = model.generate(
            inputs_embeds=torch.from_numpy(emb_np), max_new_tokens=NEW,
            do_sample=False, no_repeat_ngram_size=2, repetition_penalty=1.5,
            eos_token_id=-1,
        ).numpy()
    got_pen = np.asarray(generate(
        params, config, jnp.asarray(emb_np), jnp.full((B,), T, jnp.int32),
        NEW, eos_id=-1, compute_dtype=jnp.float32, no_repeat_ngram_size=2,
        repetition_penalty=1.5, repetition_window=NEW,
    ))
    np.testing.assert_array_equal(got_pen, hf_pen)


def test_prime_tokens_match_hf_input_ids_mode(tiny):
    """The reference ASR CLI drives HF generate with input_ids =
    [pad]*(T-1)+[bos] (reference touchnet/models/touch_audio/
    inference_touch_audio.py:75-81, attention_mask all ones), so HF's
    RepetitionPenaltyLogitsProcessor and NoRepeatNGramLogitsProcessor see
    the prompt's pad/bos ids for the whole decode — the penalty set is
    {pad, bos} from step 0 and the bigram history starts at
    {(pad,pad),(pad,bos)}. prime_tokens=(pad,pad,bos) must reproduce HF's
    input_ids-mode output exactly (matters when pad == eos: the reference
    then penalizes the eos logit systematically)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    sys.path.insert(0, os.path.dirname(__file__))
    from test_llama import _to_hf_state_dict

    config, params = tiny
    hf_cfg = transformers.LlamaConfig(
        vocab_size=config.vocab_size, hidden_size=config.hidden_size,
        intermediate_size=config.intermediate_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        num_key_value_heads=config.num_key_value_heads,
        rms_norm_eps=config.rms_norm_eps, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    model.load_state_dict(_to_hf_state_dict(params, config), strict=True)

    B, T, NEW = 1, 12, 16
    pad_id, bos_id = 0, 1
    model.generation_config.pad_token_id = pad_id
    ids = np.full((B, T), pad_id, np.int64)
    ids[:, -1] = bos_id
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(ids),
            attention_mask=torch.ones((B, T), dtype=torch.long),
            max_new_tokens=NEW, do_sample=False, no_repeat_ngram_size=2,
            repetition_penalty=1.5, eos_token_id=-1,
        )[:, T:].numpy()

    emb = jnp.take(params["model"]["embed_tokens"]["weight"],
                   jnp.asarray(ids), axis=0)
    got = np.asarray(generate(
        params, config, emb, jnp.full((B,), T, jnp.int32), NEW,
        eos_id=-1, compute_dtype=jnp.float32, no_repeat_ngram_size=2,
        repetition_penalty=1.5, repetition_window=NEW,
        prime_tokens=(pad_id, pad_id, bos_id),
    ))
    np.testing.assert_array_equal(got, hf_out)


def test_right_padded_batch_generation(tiny):
    """Rows with different prompt lengths (right padding) must decode the
    same as decoding each row alone."""
    config, params = tiny
    T = 16
    ids0 = jax.random.randint(jax.random.PRNGKey(5), (1, T), 3, config.vocab_size)
    ids1 = jax.random.randint(jax.random.PRNGKey(6), (1, 10), 3, config.vocab_size)
    emb = params["model"]["embed_tokens"]["weight"]
    e0 = jnp.take(emb, ids0, axis=0)
    e1 = jnp.take(emb, ids1, axis=0)
    e1_padded = jnp.pad(e1, ((0, 0), (0, T - 10), (0, 0)))
    batch_emb = jnp.concatenate([e0, e1_padded], axis=0)
    lens = jnp.asarray([T, 10], jnp.int32)
    got = generate(params, config, batch_emb, lens, 6, eos_id=-1,
                   compute_dtype=jnp.float32)
    solo0 = generate(params, config, e0, jnp.asarray([T]), 6, eos_id=-1,
                     compute_dtype=jnp.float32)
    solo1 = generate(params, config, e1, jnp.asarray([10]), 6, eos_id=-1,
                     compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(solo0[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(solo1[0]))


def test_sampler_repetition_penalty():
    logits = jnp.asarray([[2.0, 1.0, 0.5, -1.0]])
    recent = jnp.asarray([[0, -1, -1]])
    tok = sample_token(logits, jax.random.PRNGKey(0), temperature=0.0,
                       repetition_penalty=10.0, recent_tokens=recent)
    assert int(tok[0]) == 1  # token 0 penalized away
    tok = sample_token(logits, jax.random.PRNGKey(0), temperature=0.0)
    assert int(tok[0]) == 0


def test_sampler_top_k():
    logits = jnp.asarray([[0.0, 5.0, 4.0, -2.0]])
    for seed in range(5):
        tok = sample_token(logits, jax.random.PRNGKey(seed), temperature=1.0,
                           top_k=2)
        assert int(tok[0]) in (1, 2)


def test_sampler_top_p():
    """Nucleus keeps the smallest descending-prob prefix whose mass reaches
    top_p, crossing token included (HF TopPLogitsWarper semantics — the
    reference's inference path samples through HF generate's top_p,
    reference touchnet/models/touch_audio/inference_touch_audio.py:182)."""
    # softmax([3, 2, 1, -5]) ~= [.665, .245, .090, .0002]
    logits = jnp.asarray([[3.0, 2.0, 1.0, -5.0]])
    for seed in range(8):
        # top_p=0.5: token 0 alone crosses 0.5 -> only token 0 survives
        tok = sample_token(logits, jax.random.PRNGKey(seed), temperature=1.0,
                           top_p=0.5)
        assert int(tok[0]) == 0
        # top_p=0.8: tokens {0,1} reach 0.910 with exclusive mass 0.665
        tok = sample_token(logits, jax.random.PRNGKey(seed), temperature=1.0,
                           top_p=0.8)
        assert int(tok[0]) in (0, 1)
        # top_p=0.99: token 3's exclusive mass already exceeds it
        tok = sample_token(logits, jax.random.PRNGKey(seed), temperature=1.0,
                           top_p=0.99)
        assert int(tok[0]) in (0, 1, 2)
    # composes with top_k (k cuts first, then the nucleus over survivors)
    tok = sample_token(logits, jax.random.PRNGKey(0), temperature=1.0,
                       top_k=2, top_p=0.5)
    assert int(tok[0]) == 0


def test_chunked_prefill_matches_single_shot(tiny):
    """prefill_chunk must reproduce the single-shot prefill exactly: same
    greedy tokens for a ragged right-padded batch, including a prompt whose
    last token falls mid-chunk and a chunk count > 1 (the chunk program
    attends the cache prefix via the grouped flash entry with a kv-validity
    segment; on CPU that routes through the dense reference)."""
    config, params = tiny
    emb = params["model"]["embed_tokens"]["weight"]
    T = 40  # pads to 3 chunks of 16
    ids0 = jax.random.randint(jax.random.PRNGKey(7), (1, T), 3, config.vocab_size)
    ids1 = jax.random.randint(jax.random.PRNGKey(8), (1, 21), 3, config.vocab_size)
    e0 = jnp.take(emb, ids0, axis=0)
    e1 = jnp.pad(jnp.take(emb, ids1, axis=0), ((0, 0), (0, T - 21), (0, 0)))
    batch = jnp.concatenate([e0, e1], axis=0)
    lens = jnp.asarray([T, 21], jnp.int32)
    want = generate(params, config, batch, lens, 6, eos_id=-1,
                    compute_dtype=jnp.float32)
    got = generate(params, config, batch, lens, 6, eos_id=-1,
                   compute_dtype=jnp.float32, prefill_chunk=16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
