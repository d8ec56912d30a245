# Copyright (c) 2026 touchnet_tpu authors.
# Generator map functions of the data pipeline (CPU workers, numpy).
#
# Capability parity: reference touchnet/data/functions.py:32-316 — tokenize,
# length/ratio filters, resample, speed perturb, fbank/mfcc/log-mel frontends,
# SpecAug/SpecSub/SpecTrim, low-frame-rate stacking. Torch/sox/librosa-free:
# the DSP lives in touchnet_tpu/data/dsp.py.

import math
import random

import numpy as np

from touchnet_tpu.data import DataConfig, dsp
from touchnet_tpu.tokenizer.tokenizer import BaseTokenizer


def text_tokenize(data, tokenizer: BaseTokenizer):
    """Tokenize sample['txt'] into sample['input_ids'] (bos/eos added later in
    the batchers)."""
    for sample in data:
        if "txt" in sample:
            sample["input_ids"] = tokenizer.tokenize(
                sample["txt"], add_special_tokens=False
            )
            yield sample
        else:
            yield sample


def filter_samples(data, config: DataConfig):
    """Filter by token count, audio duration, and text/audio ratio."""
    for sample in data:
        if "input_ids" in sample:
            num_tokens = len(sample["input_ids"])
            if num_tokens < config.text_min_length_in_tokens_for_filter:
                continue
            if num_tokens > config.text_max_length_in_tokens_for_filter:
                continue
        if "waveform" in sample:
            assert "sample_rate" in sample
            duration = sample["waveform"].shape[1] / sample["sample_rate"] * 1000.0
            if config.audio_speed_perturb:
                duration *= max(config.audio_speed_perturb_speeds)
            if duration < config.audio_min_length_in_ms_for_filter:
                continue
            if duration > config.audio_max_length_in_ms_for_filter:
                continue
            if "input_ids" in sample:
                num_tokens = len(sample["input_ids"])
                if duration > 1e-7:
                    ratio = num_tokens / (duration / 10)
                    if ratio < config.min_text_audio_ratio:
                        continue
                    if ratio > config.max_text_audio_ratio:
                        continue
        yield sample


def audio_resample(data, config: DataConfig):
    for sample in data:
        assert "sample_rate" in sample and "waveform" in sample
        sr = sample["sample_rate"]
        if sr != config.audio_resample_rate:
            sample["sample_rate"] = config.audio_resample_rate
            sample["waveform"] = dsp.resample(
                sample["waveform"], sr, config.audio_resample_rate
            )
        yield sample


def audio_speed_perturb(data, config: DataConfig):
    for sample in data:
        assert "sample_rate" in sample and "waveform" in sample
        speed = random.choice(config.audio_speed_perturb_speeds)
        if speed != 1.0:
            sample["waveform"] = dsp.speed_perturb(
                sample["waveform"], sample["sample_rate"], speed
            )
        yield sample


def audio_compute_fbank(data, config: DataConfig):
    from touchnet_tpu.data import native

    for sample in data:
        assert "sample_rate" in sample and "waveform" in sample
        waveform = sample["waveform"] * (1 << 15)
        feat = None
        if config.audiofeat_dither == 0.0:
            # hot path: C++ frontend (native/frontend.cc); None -> numpy
            feat = native.fbank_native(
                waveform,
                num_mel_bins=config.audiofeat_num_mel_bins,
                frame_length=config.audiofeat_frame_length,
                frame_shift=config.audiofeat_frame_shift,
                dither=0.0,
                sample_frequency=sample["sample_rate"],
            )
        if feat is None:
            feat = dsp.fbank(
                waveform,
                num_mel_bins=config.audiofeat_num_mel_bins,
                frame_length=config.audiofeat_frame_length,
                frame_shift=config.audiofeat_frame_shift,
                dither=config.audiofeat_dither,
                energy_floor=0.0,
                sample_frequency=sample["sample_rate"],
            )
        sample["audiofeat"] = feat
        yield sample


def audio_compute_mfcc(data, config: DataConfig):
    for sample in data:
        assert "sample_rate" in sample and "waveform" in sample
        waveform = sample["waveform"] * (1 << 15)
        feat = None
        if config.audiofeat_dither == 0.0:
            # hot path: C++ frontend (native/frontend.cc); None -> numpy
            feat = native.mfcc_native(
                waveform,
                num_mel_bins=config.audiofeat_num_mel_bins,
                frame_length=config.audiofeat_frame_length,
                frame_shift=config.audiofeat_frame_shift,
                dither=0.0,
                num_ceps=config.audiofeat_num_ceps,
                sample_frequency=sample["sample_rate"],
                low_freq=config.audiofeat_low_freq,
                high_freq=config.audiofeat_high_freq,
            )
        if feat is None:
            feat = dsp.mfcc(
                waveform,
                num_mel_bins=config.audiofeat_num_mel_bins,
                frame_length=config.audiofeat_frame_length,
                frame_shift=config.audiofeat_frame_shift,
                dither=config.audiofeat_dither,
                num_ceps=config.audiofeat_num_ceps,
                high_freq=config.audiofeat_high_freq,
                low_freq=config.audiofeat_low_freq,
                sample_frequency=sample["sample_rate"],
            )
        sample["audiofeat"] = feat
        yield sample


def audio_compute_log_mel_spectrogram(data, config: DataConfig):
    """Whisper-style log-mel (see dsp.log_mel_spectrogram)."""
    for sample in data:
        assert "sample_rate" in sample and "waveform" in sample
        feat = native.logmel_native(
            sample["waveform"],
            sample_rate=sample["sample_rate"],
            n_fft=config.audiofeat_n_fft,
            hop_length=config.audiofeat_hop_length,
            n_mels=config.audiofeat_num_mel_bins,
            padding=config.audiofeat_padding,
        )
        if feat is None:
            feat = dsp.log_mel_spectrogram(
                sample["waveform"],
                sample_rate=sample["sample_rate"],
                n_fft=config.audiofeat_n_fft,
                hop_length=config.audiofeat_hop_length,
                n_mels=config.audiofeat_num_mel_bins,
                padding=config.audiofeat_padding,
            )
        sample["audiofeat"] = feat
        yield sample


def audiofeat_spec_aug(data, config: DataConfig):
    """SpecAugment time/freq masking."""
    for sample in data:
        assert "audiofeat" in sample
        y = np.array(sample["audiofeat"], copy=True)
        max_frames, max_freq = y.shape
        for _ in range(config.audiofeat_spec_aug_num_t_mask):
            start = random.randint(0, max_frames - 1)
            length = random.randint(1, config.audiofeat_spec_aug_max_t)
            end = min(max_frames, start + length)
            y[start:end, :] = 0
        for _ in range(config.audiofeat_spec_aug_num_f_mask):
            start = random.randint(0, max_freq - 1)
            length = random.randint(1, config.audiofeat_spec_aug_max_f)
            end = min(max_freq, start + length)
            y[:, start:end] = 0
        sample["audiofeat"] = y
        yield sample


def audiofeat_spec_sub(data, config: DataConfig):
    """Spec substitute (U2++ §3.2.3, arXiv:2106.05642)."""
    for sample in data:
        assert "audiofeat" in sample
        x = sample["audiofeat"]
        y = np.array(x, copy=True)
        max_frames = y.shape[0]
        for _ in range(config.audiofeat_spec_sub_num_t_sub):
            start = random.randint(0, max_frames - 1)
            length = random.randint(1, config.audiofeat_spec_sub_max_t)
            end = min(max_frames, start + length)
            pos = random.randint(0, start)
            y[start:end, :] = x[start - pos : end - pos, :]
        sample["audiofeat"] = y
        yield sample


def audiofeat_spec_trim(data, config: DataConfig):
    """Trim tailing frames (TrimTail, arXiv:2211.00522)."""
    for sample in data:
        assert "audiofeat" in sample
        x = sample["audiofeat"]
        max_frames = x.shape[0]
        length = random.randint(1, config.audiofeat_spec_trim_max_t)
        if length < max_frames / 2:
            sample["audiofeat"] = np.array(x[: max_frames - length], copy=True)
        yield sample


def audiofeat_stack(data, config: DataConfig):
    """Low-frame-rate stack/stride ([T, D] -> [ceil(T/stride), D*stack]) with
    optional per-frame mean/std normalization (FunASR wav_frontend lineage,
    reference touchnet/data/functions.py:258-286)."""
    stack = config.audiofeat_stack_length
    stride = config.audiofeat_stride_length
    for sample in data:
        assert "audiofeat" in sample
        inputs = np.asarray(sample["audiofeat"])  # (T, D)
        T = inputs.shape[0]
        T_lfr = int(math.ceil(T / stride))
        left_padding = np.tile(inputs[0], ((stack - 1) // 2, 1))
        inputs = np.vstack((left_padding, inputs))
        T = T + (stack - 1) // 2
        feat_dim = inputs.shape[-1]
        last_idx = (T - stack) // stride + 1
        num_padding = stack - (T - last_idx * stride)
        if num_padding > 0:
            num_padding = (
                (2 * stack - 2 * T + (T_lfr - 1 + last_idx) * stride)
                / 2 * (T_lfr - last_idx)
            )
            inputs = np.vstack([inputs] + [inputs[-1:]] * int(num_padding))
        itemsize = inputs.strides[-1]
        outputs = np.lib.stride_tricks.as_strided(
            inputs,
            shape=(T_lfr, stack * feat_dim),
            strides=(stride * feat_dim * itemsize, itemsize),
        )
        if config.audiofeat_normalize:
            outputs = (outputs - outputs.mean(axis=-1, keepdims=True)) / (
                outputs.std(axis=-1, keepdims=True) + 1e-5
            )
        sample["audiofeat"] = np.ascontiguousarray(outputs, dtype=np.float32)
        yield sample
