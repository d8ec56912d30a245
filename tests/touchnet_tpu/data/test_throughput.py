# Dataloader / frontend throughput floors — "the dataloader must never
# stall the TPU" (BASELINE.md north star). Floors are set ~10x below the
# rates measured on a CI-class host (docs/data.md) so they only trip on
# real regressions (e.g. an accidental O(n^2) in the packing loop), not on
# machine noise.

import os
import time

import numpy as np
import pytest

from touchnet_tpu.bin.make_data import DataBuilder
from touchnet_tpu.data import DataConfig, native
from touchnet_tpu.data.dataloader import build_dataloader
from touchnet_tpu.tokenizer import TokenizerConfig
from touchnet_tpu.tokenizer.tokenizer import build_tokenizer


def build_token_corpus(tmp_path, shards=4, samples=200):
    rng = np.random.default_rng(0)
    paths = []
    for s in range(shards):
        d = tmp_path / f"{s:09d}"
        d.mkdir()
        b = DataBuilder(str(d / "texttoken.bin"), np.int32)
        for _ in range(samples):
            n = int(rng.integers(200, 2000))
            b.add_item(rng.integers(3, 32000, n).astype(np.int32))
            b.end_document()
        b.finalize(str(d / "texttoken.idx"))
        paths.append(str(d))
    listfile = tmp_path / "data.list"
    listfile.write_text("".join(f"{p} texttoken\n" for p in paths))
    return str(listfile)


@pytest.mark.slow
def test_packed_text_batches_outpace_tpu(tmp_path):
    """Packed-8k causal_lm batches must flow far faster than a v5e chip
    consumes them (~2.7 steps/s at the bench config)."""
    listfile = build_token_corpus(tmp_path)
    cfg = DataConfig(
        datalist_path=listfile, datalist_epoch=100, datapipe_type="causal_lm",
        dataset_batchsize=1, dataset_text_seqlen=8192,
        dataloader_num_workers=2, dataloader_prefetch_factor=4,
    )
    tok = build_tokenizer(
        TokenizerConfig(tokenizer_type="RawTokenizer",
                        tokenizer_raw_vocab_size=32768)
    )
    loader = build_dataloader(cfg, tok, dp_rank=0, dp_world_size=1)
    it = iter(loader)
    for _ in range(5):
        next(it)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        next(it)
    rate = n / (time.perf_counter() - t0)
    # measured ~800/s; a v5e chip consumes ~2.7/s — require 30/s
    assert rate > 30, f"packed text loader too slow: {rate:.1f} batches/s"


@pytest.mark.skipif(not native.native_available(), reason="no C++ toolchain")
def test_native_fbank_realtime_factor():
    """Native fbank must stay comfortably realtime (measured ~1600x)."""
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000 * 30) * 8000).astype(np.float32)
    native.fbank_native(wav, 80, 25, 10, 0.0, 16000)  # warm plan cache
    t0 = time.perf_counter()
    for _ in range(5):
        native.fbank_native(wav, 80, 25, 10, 0.0, 16000)
    dt = (time.perf_counter() - t0) / 5
    assert 30.0 / dt > 100, f"native fbank only {30.0/dt:.0f}x realtime"
