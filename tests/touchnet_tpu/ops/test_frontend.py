# On-device (XLA) frontend vs CPU numpy DSP numerics.

import numpy as np
import jax.numpy as jnp

from touchnet_tpu.data import DataConfig, dsp, functions
from touchnet_tpu.ops.frontend import (
    device_frontend,
    fbank_jax,
    lfr_stack_jax,
    log_mel_spectrogram_jax,
)


def test_fbank_jax_matches_cpu():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 16000)) * 8000).astype(np.float32)
    got = np.asarray(fbank_jax(jnp.asarray(wav), num_mel_bins=40))
    for b in range(2):
        want = dsp.fbank(wav[b], num_mel_bins=40, sample_frequency=16000)
        np.testing.assert_allclose(got[b], want, atol=2e-3, rtol=2e-3)


def test_logmel_jax_matches_cpu():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    got = np.asarray(log_mel_spectrogram_jax(jnp.asarray(wav), n_mels=64))
    for b in range(2):
        want = dsp.log_mel_spectrogram(wav[b], n_mels=64)
        np.testing.assert_allclose(got[b], want, atol=2e-4, rtol=2e-4)


def test_lfr_stack_matches_cpu():
    cfg = DataConfig(audiofeat_stack_length=7, audiofeat_stride_length=6,
                     audiofeat_normalize=True)
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((100, 23)).astype(np.float32)
    want = list(functions.audiofeat_stack(iter([{"audiofeat": feats}]), cfg))[0][
        "audiofeat"
    ]
    got = np.asarray(lfr_stack_jax(jnp.asarray(feats)[None], 7, 6))[0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_device_frontend_chain():
    cfg = DataConfig(audiofeat_num_mel_bins=23)
    wav = np.random.default_rng(3).standard_normal((2, 16000)).astype(np.float32)
    out = device_frontend(jnp.asarray(wav), cfg)
    assert out.shape == (2, 17, 23 * 7)  # 98 frames -> ceil(98/6)=17
    assert np.isfinite(np.asarray(out)).all()
