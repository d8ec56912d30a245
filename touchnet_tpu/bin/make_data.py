# Copyright (c) 2026 touchnet_tpu authors.
# Dataset conversion CLI: jsonl -> sharded TouchDataset (.bin/.idx) + data.list.
#
# Capability parity: reference touchnet/bin/make_data.py:21-273 (DataBuilder,
# ffmpeg audio decode to int16 mono PCM, texttoken/audio+metainfo builders,
# multiprocessing pool over num_utt_per_shard chunks, data.list emission).
# Audio decode prefers ffmpeg when present; wav files fall back to a pure
# scipy reader so the pipeline works in ffmpeg-less environments.

import json
import multiprocessing
import os
import shutil
from subprocess import CalledProcessError, run
from typing import List, Optional, Type

import numpy

from touchnet_tpu.bin import MakeDataConfig
from touchnet_tpu.data.dataset import DType, IndexWriter
from touchnet_tpu.tokenizer import TokenizerConfig
from touchnet_tpu.tokenizer.tokenizer import build_tokenizer
from touchnet_tpu.utils.cli import parse_args_into_dataclasses
from touchnet_tpu.utils.logging import init_logger, logger


class DataBuilder:
    """Writer side of TouchDataset: append items to .bin, record lengths,
    then finalize() writes the .idx."""

    def __init__(self, bin_path: str, dtype: Type[numpy.number] = numpy.int32) -> None:
        self.data_file = open(bin_path, "wb")
        self.dtype = dtype
        self.sequence_lengths: List[int] = []
        self.document_indices: List[int] = [0]

    def add_item(self, array) -> None:
        np_array = numpy.asarray(array, dtype=self.dtype)
        self.data_file.write(np_array.tobytes(order="C"))
        self.sequence_lengths.append(np_array.size)

    def add_document(self, array, lengths: List[int]) -> None:
        np_array = numpy.asarray(array, dtype=self.dtype)
        self.data_file.write(np_array.tobytes(order="C"))
        self.sequence_lengths.extend(lengths)
        self.document_indices.append(len(self.sequence_lengths))

    def end_document(self) -> None:
        self.document_indices.append(len(self.sequence_lengths))

    def finalize(self, idx_path: str) -> None:
        self.data_file.close()
        with IndexWriter(idx_path, self.dtype) as writer:
            writer.write(self.sequence_lengths, self.document_indices)


def _load_audio_ffmpeg(file: str, sr: int, start_time: float, end_time: Optional[float]):
    cmd = [
        "ffmpeg", "-nostdin", "-threads", "0",
        "-ss", str(start_time),
        "-i", file,
        "-f", "s16le", "-ac", "1", "-acodec", "pcm_s16le", "-ar", str(sr),
    ]
    if end_time is not None:
        cmd.extend(["-t", str(end_time - start_time)])
    cmd.append("-")
    try:
        out = run(cmd, capture_output=True, check=True).stdout
    except CalledProcessError as e:
        raise Exception(f"Failed to load audio: {e.stderr.decode()}") from e
    return numpy.frombuffer(out, numpy.int16).flatten()


def _load_audio_wav(file: str, sr: int, start_time: float, end_time: Optional[float]):
    from scipy.io import wavfile

    from touchnet_tpu.data.dsp import resample

    file_sr, data = wavfile.read(file)
    if data.ndim > 1:  # downmix to mono
        data = data.mean(axis=1)
    if data.dtype == numpy.int16:
        f = data.astype(numpy.float32) / 32768.0
    elif data.dtype == numpy.int32:
        f = data.astype(numpy.float32) / 2147483648.0
    elif data.dtype == numpy.uint8:
        f = (data.astype(numpy.float32) - 128.0) / 128.0
    else:
        f = data.astype(numpy.float32)
    start = int(start_time * file_sr)
    end = int(end_time * file_sr) if end_time is not None else f.shape[0]
    f = f[start:end]
    if file_sr != sr:
        f = resample(f, file_sr, sr)
    return numpy.clip(f * 32768.0, -32768, 32767).astype(numpy.int16)


def load_audio(
    file: str, sr: int = 16000, start_time: float = 0.0, end_time: Optional[float] = None
) -> numpy.ndarray:
    """Decode an audio file to mono int16 PCM at the given rate (optionally a
    time segment). ffmpeg when available, scipy wav reader otherwise."""
    if shutil.which("ffmpeg") is not None:
        return _load_audio_ffmpeg(file, sr, start_time, end_time)
    if file.lower().endswith(".wav"):
        return _load_audio_wav(file, sr, start_time, end_time)
    raise RuntimeError(f"ffmpeg not found and {file!r} is not a wav file")


def build_texttoken(
    chunk: List[str], path_prefix: str, cur_chunk: int, num_chunks: int,
    conf: MakeDataConfig, tok_conf: TokenizerConfig, *args, **kwargs,
):
    assert tok_conf.tokenizer_model is not None, "tok_conf.tokenizer_model cannot be None"
    tokenizer = build_tokenizer(tok_conf)
    builder = DataBuilder(
        f"{path_prefix}/texttoken.bin", DType.optimal_dtype(tokenizer.vocab_size)
    )
    logger.info(f"Processing {path_prefix} {cur_chunk}/{num_chunks}")
    for sample in chunk:
        try:
            data = json.loads(sample.strip())
            if len(data["text"]) == 0:
                continue
            # bos/eos are added in batch_xxx(), not here
            texttoken = tokenizer.tokenize(data["text"], add_special_tokens=False)
        except Exception as ex:
            logger.warning(f"Catch exception in reading {sample}: {ex}")
            continue
        builder.add_item(numpy.asarray(texttoken, dtype=numpy.int64))
        builder.end_document()  # documents contain only one sentence
    builder.finalize(f"{path_prefix}/texttoken.idx")


def build_audio_and_metainfo(
    chunk: List[str], path_prefix: str, cur_chunk: int, num_chunks: int,
    conf: MakeDataConfig, *args, **kwargs,
):
    builders = {
        "audio": DataBuilder(f"{path_prefix}/audio.bin", numpy.int16),
        "metainfo": DataBuilder(f"{path_prefix}/metainfo.bin", numpy.uint8),
    }
    logger.info(f"Processing {path_prefix} {cur_chunk}/{num_chunks}")
    for sample in chunk:
        try:
            data = json.loads(sample.strip())
            waveform = load_audio(data["wav"], conf.audio_resample)
            data["sample_rate"] = conf.audio_resample
            sample_utf8 = json.dumps(data, ensure_ascii=False).strip().encode("utf-8")
            text = numpy.frombuffer(sample_utf8, dtype=numpy.uint8).copy()
        except Exception as ex:
            logger.warning(f"Catch exception in reading {sample}: {ex}")
            continue
        builders["audio"].add_item(waveform)
        builders["metainfo"].add_item(text)
        builders["audio"].end_document()
        builders["metainfo"].end_document()
    builders["audio"].finalize(f"{path_prefix}/audio.idx")
    builders["metainfo"].finalize(f"{path_prefix}/metainfo.idx")


def handle_error(e):
    logger.error(f"Catch error in subprocess: {e}")


def main(argv=None):
    os.environ["PYTHONUNBUFFERED"] = "1"
    conf, tok_conf = parse_args_into_dataclasses([MakeDataConfig, TokenizerConfig], argv)

    assert conf.jsonl_path is not None, "conf.jsonl_path cannot be None"
    with open(conf.jsonl_path, "r") as f:
        samples = [line.strip() for line in f]
    num = conf.num_utt_per_shard
    chunks = [samples[i : i + num] for i in range(0, len(samples), num)]
    os.makedirs(conf.save_dir, exist_ok=True)
    init_logger(f"{conf.save_dir}/touchnet_make_data.log")

    if conf.datatypes == "audio+metainfo":
        processor = build_audio_and_metainfo
    elif conf.datatypes == "texttoken":
        processor = build_texttoken
    else:
        raise NotImplementedError(f"unsupported datatypes {conf.datatypes!r}")

    pool = multiprocessing.Pool(processes=conf.num_workers)
    shards_list = []
    num_chunks = len(chunks)
    for i, chunk in enumerate(chunks):
        path_prefix = "{}/{:09d}".format(conf.save_dir, i)
        os.makedirs(path_prefix, exist_ok=True)
        shards_list.append(path_prefix)
        pool.apply_async(
            processor, (chunk, path_prefix, i, num_chunks, conf, tok_conf),
            error_callback=handle_error,
        )
    pool.close()
    pool.join()

    with open(f"{conf.save_dir}/data.list", "w", encoding="utf8") as fout:
        for name in shards_list:
            fout.write(f"{name} {conf.datatypes}\n")


if __name__ == "__main__":
    main()
