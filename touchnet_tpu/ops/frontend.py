# Copyright (c) 2026 touchnet_tpu authors.
# On-device audio frontend: batched fbank / whisper log-mel in XLA.
#
# Capability parity+: the reference computes features exclusively on CPU
# workers (torchaudio/sox, SURVEY.md §2.9); SURVEY.md §7 calls for an
# on-device option so the loader can ship raw int16 waveforms and never
# stall the TPU ("loader never stalls" north star). Framing is a strided
# reshape, the FFT is XLA's batched RFFT, and the mel projection is a single
# MXU matmul; numerics match the CPU path (data/dsp.py).

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from touchnet_tpu.data import dsp


@functools.partial(jax.jit, static_argnames=(
    "num_mel_bins", "frame_length", "frame_shift", "sample_frequency",
    "low_freq", "high_freq",
))
def fbank_jax(
    waveform: jax.Array,  # [B, T] int16-scale float
    num_mel_bins: int = 23,
    frame_length: int = 25,
    frame_shift: int = 10,
    sample_frequency: int = 16000,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> jax.Array:
    """Batched kaldi fbank on device. Returns [B, num_frames, num_mel_bins]
    float32 (dither-free; augment on device separately if needed)."""
    ws = int(sample_frequency * frame_length / 1000)
    sh = int(sample_frequency * frame_shift / 1000)
    B, T = waveform.shape
    m = max(1 + (T - ws) // sh, 0)
    x = waveform.astype(jnp.float32)
    # framing: gather strided windows
    idx = (jnp.arange(m)[:, None] * sh + jnp.arange(ws)[None, :])  # [m, ws]
    frames = x[:, idx]  # [B, m, ws]
    frames = frames - frames.mean(axis=-1, keepdims=True)
    first = frames[..., :1]
    frames = jnp.concatenate(
        [first - 0.97 * first, frames[..., 1:] - 0.97 * frames[..., :-1]],
        axis=-1,
    )
    n = jnp.arange(ws, dtype=jnp.float32)
    window = (0.5 - 0.5 * jnp.cos(2 * jnp.pi * n / (ws - 1))) ** 0.85
    frames = frames * window
    padded = 1 << (ws - 1).bit_length()
    spec = jnp.fft.rfft(frames, n=padded, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2)[..., : padded // 2]
    banks = jnp.asarray(
        dsp.kaldi_mel_banks(
            num_mel_bins, padded, float(sample_frequency), float(low_freq),
            float(high_freq),
        )
    )
    mel = jnp.einsum("bmf,nf->bmn", power, banks)
    return jnp.log(jnp.maximum(mel, dsp.EPSILON))


@functools.partial(jax.jit, static_argnames=("sample_rate", "n_fft",
                                             "hop_length", "n_mels"))
def log_mel_spectrogram_jax(
    waveform: jax.Array,  # [B, T]
    sample_rate: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
    n_mels: int = 128,
) -> jax.Array:
    """Batched whisper log-mel on device. Returns [B, frames, n_mels]."""
    B, T = waveform.shape
    pad = n_fft // 2
    x = jnp.pad(waveform.astype(jnp.float32), ((0, 0), (pad, pad)),
                mode="reflect")
    m = 1 + (x.shape[1] - n_fft) // hop_length
    idx = jnp.arange(m)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]
    window = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n_fft) / n_fft)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2)[:, :-1]  # drop last frame
    filters = jnp.asarray(dsp.slaney_mel_filters(sample_rate, n_fft, n_mels))
    mel = jnp.einsum("bmf,nf->bmn", power, filters)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(
        log_spec, log_spec.max(axis=(1, 2), keepdims=True) - 8.0
    )
    return (log_spec + 4.0) / 4.0


def lfr_stack_jax(feats: jax.Array, stack: int, stride: int,
                  normalize: bool = True) -> jax.Array:
    """On-device low-frame-rate stack ([B, T, D] -> [B, ceil(T/stride),
    D*stack]) matching data/functions.py:audiofeat_stack."""
    B, T, D = feats.shape
    T_lfr = math.ceil(T / stride)
    left = jnp.repeat(feats[:, :1], (stack - 1) // 2, axis=1)
    x = jnp.concatenate([left, feats], axis=1)
    need = (T_lfr - 1) * stride + stack
    if x.shape[1] < need:
        x = jnp.concatenate(
            [x, jnp.repeat(x[:, -1:], need - x.shape[1], axis=1)], axis=1
        )
    idx = jnp.arange(T_lfr)[:, None] * stride + jnp.arange(stack)[None, :]
    out = x[:, idx].reshape(B, T_lfr, stack * D)
    if normalize:
        out = (out - out.mean(-1, keepdims=True)) / (out.std(-1, keepdims=True) + 1e-5)
    return out


def device_frontend(
    waveform: jax.Array,
    config,
    feat_type: Optional[str] = None,
) -> jax.Array:
    """Full on-device chain: features + LFR stacking, driven by DataConfig."""
    feat_type = feat_type or config.audio_feat_type
    if feat_type == "fbank":
        feats = fbank_jax(
            waveform * 32768.0,
            num_mel_bins=config.audiofeat_num_mel_bins,
            frame_length=config.audiofeat_frame_length,
            frame_shift=config.audiofeat_frame_shift,
            sample_frequency=config.audio_resample_rate,
        )
    elif feat_type == "log_mel_spectrogram":
        feats = log_mel_spectrogram_jax(
            waveform,
            sample_rate=config.audio_resample_rate,
            n_fft=config.audiofeat_n_fft,
            hop_length=config.audiofeat_hop_length,
            n_mels=config.audiofeat_num_mel_bins,
        )
    else:
        raise NotImplementedError(f"device frontend for {feat_type!r}")
    return lfr_stack_jax(
        feats, config.audiofeat_stack_length, config.audiofeat_stride_length,
        config.audiofeat_normalize,
    )
