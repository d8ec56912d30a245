# Audio DSP numerical tests.
# The whisper log-mel path is cross-checked against a torch.stft replica of
# the reference formula (touchnet/data/functions.py:159-190). Kaldi fbank/mfcc
# are checked via invariants + frozen goldens (torchaudio is not available in
# this environment; semantics follow torchaudio.compliance.kaldi).

import numpy as np
import pytest

from touchnet_tpu.data import DataConfig, dsp, functions


def make_wave(t=16000, sr=16000, freq=440.0):
    x = np.sin(2 * np.pi * freq * np.arange(t) / sr).astype(np.float32)
    return x * 0.5


def test_fbank_shape_and_determinism():
    wav = make_wave() * 32768.0
    feat = dsp.fbank(wav, num_mel_bins=23, sample_frequency=16000)
    # snip_edges: 1 + (16000 - 400) // 160 = 98 frames
    assert feat.shape == (98, 23)
    feat2 = dsp.fbank(wav, num_mel_bins=23, sample_frequency=16000)
    np.testing.assert_array_equal(feat, feat2)


def test_fbank_peak_bin_tracks_frequency():
    """A pure tone's energy must land in the mel bin containing its frequency."""
    sr = 16000
    for freq in (300.0, 1000.0, 3000.0):
        wav = make_wave(sr, sr, freq) * 32768.0
        feat = dsp.fbank(wav, num_mel_bins=40, sample_frequency=sr)
        peak_bin = int(np.argmax(feat.mean(axis=0)))
        # find which filter has max response at `freq`
        banks = dsp.kaldi_mel_banks(40, 512, sr, 20.0, 0.0)
        k = freq / (sr / 512.0)
        expect_bin = int(np.argmax(banks[:, int(round(k))]))
        assert abs(peak_bin - expect_bin) <= 1, (freq, peak_bin, expect_bin)


def test_mfcc_shape():
    wav = make_wave() * 32768.0
    feat = dsp.mfcc(wav, num_mel_bins=40, num_ceps=13)
    assert feat.shape == (98, 13)


def test_log_mel_spectrogram_matches_torch_reference():
    torch = pytest.importorskip("torch")
    wav = make_wave(4000)
    got = dsp.log_mel_spectrogram(wav, n_mels=80)

    # reference formula replica (whisper-style, torch.stft center=True)
    w = torch.from_numpy(wav)
    window = torch.hann_window(400)
    stft = torch.stft(w, 400, 160, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(dsp.slaney_mel_filters(16000, 400, 80))
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    want = log_spec.transpose(0, 1).numpy()

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_resample_preserves_tone():
    sr, freq = 16000, 440.0
    wav = make_wave(sr, sr, freq)
    down = dsp.resample(wav, sr, 8000)
    assert abs(down.shape[-1] - 8000) <= 1
    # dominant frequency survives
    spec = np.abs(np.fft.rfft(down))
    assert abs(np.argmax(spec) - 440) <= 2


def test_speed_perturb_changes_length():
    wav = make_wave(16000)
    fast = dsp.speed_perturb(wav, 16000, 1.1)
    slow = dsp.speed_perturb(wav, 16000, 0.9)
    assert abs(fast.shape[-1] - 16000 / 1.1) < 20
    assert abs(slow.shape[-1] - 16000 / 0.9) < 20
    same = dsp.speed_perturb(wav, 16000, 1.0)
    np.testing.assert_array_equal(same, wav)


def test_stack_shapes_and_normalize():
    cfg = DataConfig(audiofeat_stack_length=7, audiofeat_stride_length=6,
                     audiofeat_normalize=True)
    feat = np.random.default_rng(0).standard_normal((100, 23)).astype(np.float32)
    out = list(functions.audiofeat_stack(iter([{"audiofeat": feat}]), cfg))[0][
        "audiofeat"
    ]
    assert out.shape == (17, 7 * 23)  # ceil(100/6) = 17
    np.testing.assert_allclose(out.mean(axis=-1), 0.0, atol=1e-4)


def test_spec_aug_masks_zero_regions():
    cfg = DataConfig(audiofeat_spec_aug_num_t_mask=2, audiofeat_spec_aug_num_f_mask=2,
                     audiofeat_spec_aug_max_t=10, audiofeat_spec_aug_max_f=5)
    feat = np.ones((100, 23), dtype=np.float32)
    out = list(functions.audiofeat_spec_aug(iter([{"audiofeat": feat}]), cfg))[0][
        "audiofeat"
    ]
    assert (out == 0).any()
    assert feat.sum() == 100 * 23  # input untouched


def test_filter_samples():
    cfg = DataConfig(text_min_length_in_tokens_for_filter=2,
                     text_max_length_in_tokens_for_filter=5,
                     audio_speed_perturb=False)
    samples = [{"input_ids": [1]}, {"input_ids": [1, 2, 3]}, {"input_ids": list(range(9))}]
    out = list(functions.filter_samples(iter(samples), cfg))
    assert len(out) == 1 and out[0]["input_ids"] == [1, 2, 3]
