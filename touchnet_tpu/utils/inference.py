# Copyright (c) 2026 touchnet_tpu authors.
# Batch-inference utilities + InferenceConfig.
#
# Capability parity: reference touchnet/utils/inference.py:28-146
# (InferenceConfig, jsonl AudioDataset, DistributedSampler sharding,
# left/right padded batching, per-rank part files). Single-controller JAX:
# process_index shards the jsonl; padding is right-side (our generate masks
# by true length, so left padding is unnecessary).

import json
import os
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

import numpy as np


@dataclass
class InferenceConfig:
    model_path: Optional[str] = field(default=None, metadata={"help": "ckpt or HF dir"})
    model_dtype: str = field(default="bfloat16")
    instruct: str = field(default="Generate the transcription:")
    data_list: Optional[str] = field(default=None, metadata={"help": "jsonl path"})
    output_dir: str = field(default="./exp/inference")
    batch_size: int = field(default=8)
    num_workers: int = field(default=2)
    prefetch: int = field(default=2)
    inference_enable_liger_kernel: bool = field(default=False)
    max_length: int = field(default=512)
    training_model_config_path: Optional[str] = field(default=None)
    step: int = field(default=-1)


class AudioJsonlDataset:
    """jsonl of {key, wav, txt?} records, sharded across processes."""

    def __init__(self, jsonl_path: str, rank: int = 0, world_size: int = 1):
        self.samples: List[dict] = []
        with open(jsonl_path) as f:
            for i, line in enumerate(f):
                if i % world_size == rank:
                    self.samples.append(json.loads(line))

    def __len__(self):
        return len(self.samples)

    def __iter__(self) -> Iterator[dict]:
        from touchnet_tpu.bin.make_data import load_audio

        for s in self.samples:
            wav = load_audio(s["wav"], 16000).astype(np.float32) / 32768.0
            yield {**s, "waveform": wav, "sample_rate": 16000}


def batched(iterable, batch_size: int):
    buf = []
    for x in iterable:
        buf.append(x)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf:
        yield buf


def pad_right(arrays: List[np.ndarray], pad_value) -> np.ndarray:
    maxlen = max(a.shape[0] for a in arrays)
    out = np.full((len(arrays), maxlen) + arrays[0].shape[1:], pad_value,
                  dtype=arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0]] = a
    return out


def part_file(output_dir: str, rank: int) -> str:
    os.makedirs(output_dir, exist_ok=True)
    return os.path.join(output_dir, f"part_{rank}")


def write_results(path: str, results: List[dict]):
    with open(path, "w", encoding="utf8") as f:
        for r in results:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
