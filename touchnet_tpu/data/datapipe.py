# Copyright (c) 2026 touchnet_tpu authors.
# Stateful, exactly-resumable streaming datapipes.
#
# Capability parity: reference touchnet/data/datapipe.py:16-213
# (LowLevelTouchDatapipe with 2-level shuffle + 2-level sharding and
# {epoch, consumed_lists, consumed_samples} checkpoint state;
# MidLevelTouchDatapipe generator-composition whose state delegates to the
# root). Torch-free: RNG is numpy PCG64 (deterministic by seed), worker
# sharding is explicit (worker_id/num_workers set by the dataloader instead of
# torch.utils.data.get_worker_info()).

import json
from typing import Any, Dict, Iterator

import numpy

from touchnet_tpu.data import DataConfig
from touchnet_tpu.data.dataset import TouchDataset


def _randperm(n: int, seed: int) -> numpy.ndarray:
    return numpy.random.Generator(numpy.random.PCG64(seed)).permutation(n)


def _randint(low: int, high: int, seed: int) -> int:
    """Uniform integer in [low, high) with a fresh seeded generator."""
    return int(numpy.random.Generator(numpy.random.PCG64(seed)).integers(low, high))


class LowLevelTouchDatapipe:
    """Root of every pipeline: iterates TouchDataset shards listed in a
    data.list file ("<dir> <datatypes>" lines).

    Two-level shuffle: shard-list permutation seeded by epoch; in-shard sample
    permutation seeded by (epoch + consumed_lists). Two-level sharding:
    dp-rank stride over the shard list, then dataloader-worker stride.
    Resumable via {epoch, consumed_lists, consumed_samples}.
    """

    def __init__(
        self,
        config: DataConfig,
        dp_rank: int,
        dp_world_size: int,
        worker_id: int = 0,
        num_workers: int = 1,
        split: str = "train",
    ):
        datalist_path = {
            "train": config.datalist_path,
            "dev": config.datalist_dev_path,
            "test": config.datalist_test_path,
        }[split]
        self.lists = []
        with open(datalist_path, "r") as f:
            for line in f:
                parts = line.strip().split()
                if not parts:
                    continue
                assert len(parts) == 2, f"bad data.list line: {line!r}"
                self.lists.append(dict(dir=parts[0], datatypes=parts[1]))
        self.config = config
        self.dp_rank = dp_rank
        self.dp_world_size = dp_world_size
        self.worker_id = worker_id
        self.num_workers = num_workers

        # Checkpoint state
        self.epoch = 0
        self.consumed_lists = 0
        self.consumed_samples = 0

    def load_state_dict(self, state_dict: Dict[str, Any]) -> None:
        self.epoch = state_dict["epoch"]
        self.consumed_lists = state_dict["consumed_lists"]
        self.consumed_samples = state_dict["consumed_samples"]

    def state_dict(self) -> Dict[str, Any]:
        return {
            "epoch": self.epoch,
            "consumed_lists": self.consumed_lists,
            "consumed_samples": self.consumed_samples,
        }

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        config = self.config
        while self.epoch < config.datalist_epoch:
            list_idxs = list(range(len(self.lists)))
            # 1st shuffle on shard lists
            if config.datalist_shuffling:
                list_idxs = _randperm(len(self.lists), self.epoch).tolist()
            # 1st sharding on dp ranks
            if config.datalist_sharding:
                assert len(list_idxs) >= self.dp_world_size, (
                    f"{len(list_idxs)} shards < dp_world_size {self.dp_world_size}"
                )
                list_idxs = list_idxs[self.dp_rank :: self.dp_world_size]
            # 2nd sharding on dataloader workers
            if config.datalist_epoch > 1:
                assert len(list_idxs) >= self.num_workers, (
                    f"{len(list_idxs)} shards < num_workers {self.num_workers}"
                )
            list_idxs = list_idxs[self.worker_id :: self.num_workers]

            start_list = self.consumed_lists
            for list_idx in list_idxs[start_list:]:
                _dataset = TouchDataset(
                    self.lists[list_idx]["dir"],
                    config.dataset_mmap,
                    self.lists[list_idx]["datatypes"],
                )
                # 2nd shuffle on samples
                num_samples = len(_dataset)
                if config.dataset_shuffling:
                    sample_idxs = _randperm(
                        num_samples, self.epoch + self.consumed_lists
                    ).tolist()
                else:
                    sample_idxs = list(range(num_samples))

                start_sample = self.consumed_samples
                for sample_idx in sample_idxs[start_sample:]:
                    datatypes = self.lists[list_idx]["datatypes"]
                    if datatypes == "metainfo":
                        # text pre-training from raw text metainfo
                        metainfo = _dataset.get(sample_idx, "metainfo")
                        metainfo = json.loads(metainfo.tobytes().decode("utf-8").strip())
                        metainfo["datatypes"] = "metainfo"
                        item = metainfo
                    elif datatypes == "texttoken":
                        # text pre-training from pre-tokenized ids
                        texttoken = _dataset.get(sample_idx, "texttoken").tolist()
                        item = dict(input_ids=texttoken, datatypes="texttoken")
                    elif datatypes == "audio+metainfo":
                        # audio pre-training / audio-text alignment
                        metainfo = _dataset.get(sample_idx, "metainfo")
                        metainfo = json.loads(metainfo.tobytes().decode("utf-8").strip())
                        offset = 0
                        length = None
                        sample_rate = metainfo["sample_rate"]
                        info = metainfo.get("info", None)
                        if info is not None and config.dataset_load_audio_via_segments:
                            segments = info.get("segments", None)
                            if segments is not None:
                                seed = self.epoch + self.consumed_lists + self.consumed_samples
                                segment = segments[_randint(0, len(segments), seed)]
                                start = int(float(segment["start"]) * sample_rate)
                                end = int(float(segment["end"]) * sample_rate)
                                offset = start
                                length = end - start
                                metainfo["txt"] = segment["txt"]
                        if config.dataset_random_cut_audio:
                            _, total_length = _dataset.get_idx(sample_idx, "audio")
                            total_length = int(total_length)
                            min_length = (
                                config.dataset_random_cut_audio_min_length_in_ms
                                / 1000.0 * sample_rate
                            )
                            max_length = (
                                config.dataset_random_cut_audio_max_length_in_ms
                                / 1000.0 * sample_rate
                            )
                            assert max_length > min_length
                            if total_length > min_length:
                                seed = self.epoch + self.consumed_lists + self.consumed_samples
                                length = _randint(
                                    int(min_length), min(total_length, int(max_length)), seed
                                )
                                offset = _randint(0, max(1, total_length - length), seed)
                        audio = _dataset.get(sample_idx, "audio", offset=offset, length=length)
                        # int16 PCM -> float32 in [-1, 1]
                        metainfo["waveform"] = (
                            audio.astype(numpy.float32) / 32768.0
                        )[None, :]  # [1, T]
                        metainfo["datatypes"] = "audio+metainfo"
                        item = metainfo
                    else:
                        raise NotImplementedError(f"unsupported datatypes: {datatypes}")
                    # state is advanced BEFORE the yield so that a state_dict()
                    # taken by the consumer right after receiving this item
                    # resumes at the next one (generators suspend at yield).
                    self.consumed_samples += 1
                    yield item

                self.consumed_samples = 0
                self.consumed_lists += 1

            # Reset states
            self.consumed_samples = 0
            self.consumed_lists = 0
            self.epoch += 1


class MidLevelTouchDatapipe:
    """Generator-function composition node: wraps ``f(iter(source), *args)``.
    Checkpoint state delegates to the source, so a whole chain checkpoints
    through its root LowLevelTouchDatapipe."""

    def __init__(self, source, f, *args, **kw):
        assert callable(f)
        self.source = source
        self.f = f
        self.args = args
        self.kw = kw

    def __iter__(self):
        assert self.source is not None
        return self.f(iter(self.source), *self.args, **self.kw)

    def apply(self, f):
        assert callable(f)
        return MidLevelTouchDatapipe(self, f, *self.args, **self.kw)

    def load_state_dict(self, state_dict: Dict[str, Any]) -> None:
        self.source.load_state_dict(state_dict)

    def state_dict(self) -> Dict[str, Any]:
        return self.source.state_dict()
