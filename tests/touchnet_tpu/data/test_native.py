# Native C++ frontends (fbank / mfcc / whisper log-mel) vs numpy DSP:
# numerics must agree closely.

import numpy as np
import pytest

from touchnet_tpu.data import dsp, native


@pytest.mark.skipif(not native.native_available(), reason="no C++ toolchain")
def test_native_fbank_matches_numpy():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 8000.0).astype(np.float32)
    got = native.fbank_native(wav, 40, 25, 10, 0.0, 16000)
    want = dsp.fbank(wav, num_mel_bins=40, frame_length=25, frame_shift=10,
                     dither=0.0, sample_frequency=16000)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


@pytest.mark.skipif(not native.native_available(), reason="no C++ toolchain")
def test_native_fbank_speedup():
    import time

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000 * 30) * 8000.0).astype(np.float32)
    native.fbank_native(wav, 80, 25, 10, 0.0, 16000)  # warm cache
    t0 = time.perf_counter()
    for _ in range(3):
        native.fbank_native(wav, 80, 25, 10, 0.0, 16000)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        dsp.fbank(wav, num_mel_bins=80, sample_frequency=16000)
    t_numpy = time.perf_counter() - t0
    print(f"native {t_native:.3f}s vs numpy {t_numpy:.3f}s")
    # the native path must beat the numpy batched-FFT implementation
    assert t_native < t_numpy * 1.5


def test_short_audio_zero_frames():
    if not native.native_available():
        pytest.skip("no toolchain")
    out = native.fbank_native(np.zeros(100, np.float32), 23, 25, 10, 0.0, 16000)
    assert out.shape == (0, 23)


@pytest.mark.skipif(not native.native_available(), reason="no C++ toolchain")
def test_native_mfcc_matches_numpy():
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(16000 * 2) * 8000.0).astype(np.float32)
    got = native.mfcc_native(wav, 23, 25, 10, 0.0, 13, 16000)
    want = dsp.mfcc(wav, num_mel_bins=23, frame_length=25, frame_shift=10,
                    dither=0.0, num_ceps=13, sample_frequency=16000)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


@pytest.mark.skipif(not native.native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("n_fft,n_mels,padding", [(400, 128, 479), (512, 80, 0)])
def test_native_logmel_matches_numpy(n_fft, n_mels, padding):
    # n_fft=400 exercises the Bluestein chirp-z path (not a power of two);
    # 512 the radix-2 path. padding=479 mirrors the Whisper 30 s contract.
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    got = native.logmel_native(wav, 16000, n_fft, 160, n_mels, padding=padding)
    want = dsp.log_mel_spectrogram(wav, 16000, n_fft=n_fft, hop_length=160,
                                   n_mels=n_mels, padding=padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(not native.native_available(), reason="no C++ toolchain")
def test_native_mfcc_lifter_and_freq_range():
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(16000) * 8000.0).astype(np.float32)
    got = native.mfcc_native(wav, 40, 25, 10, 0.0, 20, 16000,
                             cepstral_lifter=30.0, low_freq=40.0,
                             high_freq=-400.0)
    want = dsp.mfcc(wav, num_mel_bins=40, frame_length=25, frame_shift=10,
                    dither=0.0, num_ceps=20, cepstral_lifter=30.0,
                    low_freq=40.0, high_freq=-400.0, sample_frequency=16000)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
