# torch-CPU RNG compatibility: the BestRQ tokenizer's frozen init must
# reproduce the reference's torch.Generator stream (round-2 VERDICT weak
# #8) so datasets tokenized by either framework interoperate. Real torch
# (CPU) is the golden oracle here.

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from touchnet_tpu.tokenizer import TokenizerConfig
from touchnet_tpu.tokenizer.tokenizer import BestRQTokenizer
from touchnet_tpu.tokenizer.torch_rng import (
    TorchCpuGenerator,
    normal,
    xavier_uniform,
)


@pytest.mark.parametrize("seed", [0, 7, 2025])
def test_mt19937_stream_matches_std(seed):
    # at::mt19937 == std::mt19937; torch.randint 32-bit draws expose it?
    # simpler: pin the uniform float stream which consumes one u32/element
    g = torch.Generator().manual_seed(seed)
    t = torch.empty(64)
    t.uniform_(0.0, 1.0, generator=g)
    mg = TorchCpuGenerator(seed)
    np.testing.assert_array_equal(t.numpy(), mg.uniform_float(64, 0.0, 1.0))


@pytest.mark.parametrize("shape", [(4, 6), (80, 16), (560, 256)])
def test_xavier_uniform_bit_exact(shape):
    g = torch.Generator().manual_seed(2025)
    t = torch.empty(*shape)
    torch.nn.init.xavier_uniform_(t, generator=g)
    mg = TorchCpuGenerator(2025)
    np.testing.assert_array_equal(
        t.numpy(), xavier_uniform(shape[0], shape[1], mg)
    )


def test_normal_small_serial_path_bit_exact():
    g = torch.Generator().manual_seed(123)
    t = torch.empty(6)
    torch.nn.init.normal_(t, generator=g)
    mg = TorchCpuGenerator(123)
    np.testing.assert_array_equal(t.numpy(), normal((6,), mg))


@pytest.mark.parametrize("shape", [(48,), (8192, 16)])
def test_normal_fill_path_within_one_ulp(shape):
    """torch's n>=16 normal_fill runs Sleef SIMD cos/sin in most builds —
    1-ulp differences there are inherent (torch's own AVX2/AVX512/NEON
    builds disagree the same way; compounding through log/sqrt/cos adds a
    few more on rare elements). Require <= 8 ulps everywhere and
    bit-equality on the large majority."""
    g = torch.Generator().manual_seed(5)
    t = torch.empty(*shape)
    torch.nn.init.normal_(t, generator=g)
    ref = t.numpy()
    mg = TorchCpuGenerator(5)
    got = normal(shape, mg)
    ulps = np.abs(
        ref.view(np.int32).astype(np.int64) - got.view(np.int32).astype(np.int64)
    )
    assert ulps.max() <= 8, ulps.max()
    assert (ulps == 0).mean() > 0.8, (ulps == 0).mean()


def test_bestrq_token_ids_match_torch_reference():
    """End-to-end: ids from our tokenizer vs the reference algorithm run
    in real torch (same seed) on random fbank-like features."""
    import torch.nn.functional as F

    cfg = TokenizerConfig(
        tokenizer_bestrq_input_size=80,
        tokenizer_bestrq_emb_size=16,
        tokenizer_bestrq_vocab_size=1024,
        tokenizer_bestrq_init_seed=2025,
    )
    ours = BestRQTokenizer(cfg)

    # reference construction (touchnet/tokenizer/tokenizer.py:244-300)
    g = torch.Generator().manual_seed(2025)
    quantizer = torch.empty(80, 16)
    codebook = torch.empty(1024, 16)
    torch.nn.init.xavier_uniform_(quantizer, generator=g)
    torch.nn.init.normal_(codebook, generator=g)
    codebook = F.normalize(codebook, dim=1, p=2, eps=1e-8)

    feats = np.random.default_rng(0).standard_normal((2000, 80)).astype(np.float32)
    xs = torch.matmul(torch.from_numpy(feats), quantizer)
    xs = F.normalize(xs, dim=-1, p=2, eps=1e-8)
    ref_codes = torch.linalg.vector_norm(
        xs.unsqueeze(1) - codebook.unsqueeze(0), dim=-1
    ).argmin(dim=-1).numpy()

    got = np.asarray(ours.tokenize(feats))
    agree = (got == ref_codes).mean()
    assert agree == 1.0, f"token id agreement {agree:.6f} < 1.0"
