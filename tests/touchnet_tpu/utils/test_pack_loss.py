# Pack-loss identity (reference tests/touchnet/utils/test_pack_loss.py):
# the packed-sequence loss with per-sentence normalization must equal the
# mean per-sample loss of the same sentences run as a padded batch — and the
# identity must survive sequence sharding (loss-parallel / cp-style splits).

import jax
import jax.numpy as jnp
import numpy as np

from touchnet_tpu.loss import cross_entropy_loss, per_position_cross_entropy


def make_sentences(rng, n, vocab=32, maxlen=12):
    out = []
    for _ in range(n):
        L = int(rng.integers(3, maxlen))
        logits = rng.standard_normal((L, vocab)).astype(np.float32)
        labels = rng.integers(0, vocab, L).astype(np.int32)
        out.append((logits, labels))
    return out


def padded_per_sample_mean(sentences, vocab):
    """Per-sample mean CE, averaged over samples (the DP loss)."""
    losses = []
    for logits, labels in sentences:
        ce = per_position_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
        losses.append(jnp.mean(ce))
    return float(sum(losses) / len(losses))


def pack(sentences, vocab, rows, seqlen):
    logits = np.zeros((rows, seqlen, vocab), np.float32)
    labels = np.full((rows, seqlen), -100, np.int32)
    slens = np.ones((rows, seqlen), np.int32)
    r, t = 0, 0
    for lg, lb in sentences:
        L = len(lb)
        if t + L > seqlen:
            r += 1
            t = 0
        logits[r, t : t + L] = lg
        labels[r, t : t + L] = lb
        slens[r, t : t + L] = L
        t += L
    assert r < rows
    return logits, labels, slens


def test_packed_equals_padded_dp_loss():
    rng = np.random.default_rng(0)
    vocab = 32
    sentences = make_sentences(rng, 10, vocab)
    want = padded_per_sample_mean(sentences, vocab)

    logits, labels, slens = pack(sentences, vocab, rows=3, seqlen=48)
    got, _ = cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(slens),
        jnp.asarray(float(len(sentences))),
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_packed_loss_additive_over_sequence_shards():
    """Splitting the packed sequence dim (cp/loss-parallel style) and summing
    the per-shard losses reproduces the full loss — the property that makes
    pack loss compatible with sequence sharding."""
    rng = np.random.default_rng(1)
    vocab = 32
    sentences = make_sentences(rng, 8, vocab)
    logits, labels, slens = pack(sentences, vocab, rows=2, seqlen=64)
    n = jnp.asarray(float(len(sentences)))
    full, _ = cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(slens), n
    )
    half = 32
    parts = []
    for sl in (slice(0, half), slice(half, 64)):
        p, _ = cross_entropy_loss(
            jnp.asarray(logits[:, sl]), jnp.asarray(labels[:, sl]),
            jnp.asarray(slens[:, sl]), n,
        )
        parts.append(float(p))
    np.testing.assert_allclose(sum(parts), float(full), rtol=1e-5)


def test_loss_parallel_vocab_shard_equivalence():
    """Loss computed from vocab-sharded logits on an 8-device mesh equals the
    replicated computation (GSPMD loss parallel)."""
    from touchnet_tpu.parallel.dims import ParallelDims
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(2)
    vocab = 64
    sentences = make_sentences(rng, 6, vocab)
    logits, labels, slens = pack(sentences, vocab, rows=2, seqlen=32)
    n = jnp.asarray(float(len(sentences)))
    want, _ = cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(slens), n
    )
    pd = ParallelDims(world_size=8, dp_shard=2, tp=4)
    mesh = pd.build_mesh()
    sharded_logits = jax.device_put(
        jnp.asarray(logits), NamedSharding(mesh, P("dp_shard", None, "tp"))
    )
    with mesh:
        got, _ = jax.jit(cross_entropy_loss)(
            sharded_logits, jnp.asarray(labels), jnp.asarray(slens), n
        )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
