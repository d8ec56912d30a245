# Packed-text batcher semantics (reference processing_llama.py:24-104).

import numpy as np

from touchnet_tpu.data import DataConfig
from touchnet_tpu.models.llama.processing_llama import IGNORE_ID, batch_text


class FakeTokenizer:
    bos = 1
    eos = 2
    pad = 0


def run_batcher(samples, batchsize=2, seqlen=8, drop_last=False):
    cfg = DataConfig(dataset_batchsize=batchsize, dataset_text_seqlen=seqlen,
                     dataloader_drop_last_batch=drop_last)
    stream = iter([{"input_ids": s} for s in samples])
    return list(batch_text(stream, cfg, FakeTokenizer()))


def test_single_batch_packing():
    batches = run_batcher([[10, 11], [20, 21, 22], [30]])
    assert len(batches) == 1
    b = batches[0]
    # row 0: [bos 10 11][bos 20 21 22][bos 30] -> 3 + 4 + 2 = 9 > 8, so
    # sentence 2 starts row 1... recheck: 3 + 4 = 7 fits; +2 > 8 -> row 1.
    np.testing.assert_array_equal(b["input_ids"][0], [1, 10, 11, 1, 20, 21, 22, 0])
    np.testing.assert_array_equal(b["labels"][0],
                                  [10, 11, 2, 20, 21, 22, 2] + [IGNORE_ID])
    np.testing.assert_array_equal(b["position_ids"][0], [0, 1, 2, 0, 1, 2, 3, 0])
    np.testing.assert_array_equal(b["attention_mask"][0], [1, 1, 1, 2, 2, 2, 2, 0])
    np.testing.assert_array_equal(b["sentence_lens"][0], [3, 3, 3, 4, 4, 4, 4, 1])
    np.testing.assert_array_equal(b["input_ids"][1], [1, 30, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(b["attention_mask"][1], [1, 1, 0, 0, 0, 0, 0, 0])
    assert b["num_sentence"] == 3


def test_full_buffer_yields():
    # each sentence fills a whole row (7 tokens + bos = 8)
    samples = [list(range(10, 17))] * 5
    batches = run_batcher(samples, batchsize=2, seqlen=8, drop_last=False)
    assert len(batches) == 3
    assert batches[0]["num_sentence"] == 2
    assert batches[1]["num_sentence"] == 2
    assert batches[2]["num_sentence"] == 1


def test_drop_last():
    samples = [list(range(10, 17))] * 5
    batches = run_batcher(samples, batchsize=2, seqlen=8, drop_last=True)
    assert len(batches) == 2


def test_oversized_sentence_dropped():
    batches = run_batcher([list(range(100))], batchsize=1, seqlen=8, drop_last=False)
    assert len(batches) == 0
