# End-to-end ASR inference smoke: tiny touch_audio HF checkpoint + wav jsonl
# -> inference_touch_audio CLI -> part files -> error_rate scorer.

import json
import os

import jax
import numpy as np
import pytest
from scipy.io import wavfile

CFG = os.path.join(
    os.path.dirname(__file__), "..", "..", "assets", "config",
    "tiny_touch_audio.json",
)


@pytest.mark.slow
def test_inference_touch_audio_e2e(tmp_path):
    safetensors = pytest.importorskip("safetensors.numpy")
    from touchnet_tpu.models.touch_audio.configuration_touch_audio import (
        TouchAudioConfig,
    )
    from touchnet_tpu.models.touch_audio.convert import params_to_hf_state_dict
    from touchnet_tpu.models.touch_audio.modeling_touch_audio import init_params
    from touchnet_tpu.models.touch_audio.inference_touch_audio import main

    config = TouchAudioConfig.from_json_file(CFG)
    params = init_params(config, jax.random.PRNGKey(0))
    sd = params_to_hf_state_dict(config, jax.tree.map(np.asarray, params))
    model_dir = tmp_path / "hf_model"
    model_dir.mkdir()
    safetensors.save_file(sd, str(model_dir / "model.safetensors"))

    jsonl = tmp_path / "test.jsonl"
    rng = np.random.default_rng(0)
    with open(jsonl, "w") as f:
        for i in range(3):
            wav = (rng.standard_normal(8000) * 3000).astype(np.int16)
            p = tmp_path / f"u{i}.wav"
            wavfile.write(p, 16000, wav)
            f.write(json.dumps({"key": f"u{i}", "wav": str(p), "txt": "x"}) + "\n")

    out_dir = tmp_path / "out"
    main([
        "--model_path", str(model_dir),
        "--training_model_config_path", CFG,
        "--data_list", str(jsonl),
        "--output_dir", str(out_dir),
        "--batch_size", "2",
        "--max_length", "6",
        "--inference_prefill_chunk", "8",  # chunked prefill through the CLI
        "--tokenizer_type", "RawTokenizer",
        "--tokenizer_raw_vocab_size", "64",
        "--audiofeat_num_mel_bins", "23",
    ])
    results = [json.loads(l) for l in open(out_dir / "part_0")]
    assert len(results) == 3
    assert all("hyp" in r and r["key"].startswith("u") for r in results)


class _FakeTok:
    """Character/special-token tokenizer with pinned ids for the tokens the
    model config must agree on (audio token index, media markers)."""

    def __init__(self, pinned, limit, eos=1, bos=2):
        import re

        self._re = re.compile(r"<\|[^|]*\|>|.")
        self.map = dict(pinned)
        self.limit = limit
        self.eos = eos
        self.bos = bos
        self._next = 0

    def tokenize(self, text, add_special_tokens=False):
        out = []
        for p in self._re.findall(text):
            if p not in self.map:
                self.map[p] = 3 + (self._next % (self.limit - 3))
                self._next += 1
            out.append(self.map[p])
        return out

    def detokenize(self, toks):
        return " ".join(str(t) for t in toks)


def _write_wav_jsonl(tmp_path, n=2, seconds=0.5):
    from scipy.io import wavfile as _wavfile

    rng = np.random.default_rng(0)
    jsonl = tmp_path / "test.jsonl"
    with open(jsonl, "w") as f:
        for i in range(n):
            wav = (rng.standard_normal(int(16000 * seconds)) * 3000).astype(
                np.int16
            )
            p = tmp_path / f"u{i}.wav"
            _wavfile.write(p, 16000, wav)
            f.write(json.dumps({"key": f"u{i}", "wav": str(p), "txt": "x"}) + "\n")
    return jsonl


def _hf_dir(tmp_path, config, init_params, to_hf, safetensors):
    params = init_params(config, jax.random.PRNGKey(0))
    sd = to_hf(config, jax.tree.map(np.asarray, params))
    model_dir = tmp_path / "hf_model"
    model_dir.mkdir()
    safetensors.save_file(sd, str(model_dir / "model.safetensors"))
    return model_dir


@pytest.mark.slow
def test_inference_qwen2_audio_e2e(tmp_path, monkeypatch):
    safetensors = pytest.importorskip("safetensors.numpy")
    import touchnet_tpu.models.qwen2_audio.inference_qwen2_audio as binary
    from tests.touchnet_tpu.models.test_qwen2_audio import TINY
    from touchnet_tpu.models.qwen2_audio.configuration_qwen2_audio import (
        Qwen2AudioConfig,
    )
    from touchnet_tpu.models.qwen2_audio.convert import params_to_hf_state_dict
    from touchnet_tpu.models.qwen2_audio.modeling_qwen2_audio import init_params

    config = Qwen2AudioConfig.from_dict(TINY)
    cfg_json = tmp_path / "config.json"
    cfg_json.write_text(json.dumps(TINY))
    model_dir = _hf_dir(tmp_path, config, init_params,
                        params_to_hf_state_dict, safetensors)
    jsonl = _write_wav_jsonl(tmp_path)

    fake = _FakeTok(
        pinned={"<|AUDIO|>": TINY["audio_token_index"]},
        limit=TINY["text_config"]["vocab_size"],
    )
    monkeypatch.setattr(binary, "build_tokenizer", lambda cfg: fake)

    out_dir = tmp_path / "out"
    binary.main([
        "--model_path", str(model_dir),
        "--training_model_config_path", str(cfg_json),
        "--data_list", str(jsonl),
        "--output_dir", str(out_dir),
        "--batch_size", "2",
        "--max_length", "4",
        "--num_workers", "2",
        "--prefetch", "2",
        "--tokenizer_type", "RawTokenizer",
        "--tokenizer_raw_vocab_size", "64",
    ])
    results = [json.loads(l) for l in open(out_dir / "part_0")]
    assert len(results) == 2
    assert all("hyp" in r for r in results)


@pytest.mark.slow
def test_inference_kimi_audio_e2e(tmp_path, monkeypatch):
    safetensors = pytest.importorskip("safetensors.numpy")
    import touchnet_tpu.models.kimi_audio.inference_kimi_audio as binary
    from tests.touchnet_tpu.models.test_kimi_audio import TINY
    from touchnet_tpu.models.kimi_audio.configuration_kimi_audio import (
        KimiAudioConfig,
    )
    from touchnet_tpu.models.kimi_audio.convert import params_to_hf_state_dict
    from touchnet_tpu.models.kimi_audio.modeling_kimi_audio import init_params

    # 30s-padded whisper features are 1500 post-conv frames: the pos tables
    # must be real-whisper-sized (the model tests use short synthetic feats)
    tiny = json.loads(json.dumps(TINY))
    tiny["speech_encoder_config"]["max_source_positions"] = 1500
    tiny["speech_tokenizer_config"]["max_source_positions"] = 1500
    config = KimiAudioConfig.from_dict(tiny)
    cfg_json = tmp_path / "config.json"
    cfg_json.write_text(json.dumps(tiny))
    model_dir = _hf_dir(tmp_path, config, init_params,
                        params_to_hf_state_dict, safetensors)
    jsonl = _write_wav_jsonl(tmp_path)

    fake = _FakeTok(
        pinned={
            "<|im_media_begin|>": TINY["kimia_media_begin"],
            "<|im_media_end|>": TINY["kimia_media_end"],
        },
        limit=64,  # well under kimia_token_offset=100
    )
    monkeypatch.setattr(binary, "build_tokenizer", lambda cfg: fake)

    out_dir = tmp_path / "out"
    binary.main([
        "--model_path", str(model_dir),
        "--training_model_config_path", str(cfg_json),
        "--data_list", str(jsonl),
        "--output_dir", str(out_dir),
        "--batch_size", "2",
        "--max_length", "4",
        "--num_workers", "2",
        "--tokenizer_type", "RawTokenizer",
        "--tokenizer_raw_vocab_size", "64",
    ])
    results = [json.loads(l) for l in open(out_dir / "part_0")]
    assert len(results) == 2
    assert all("hyp" in r for r in results)


@pytest.mark.slow
def test_inference_kimi_audio_dual_stream_e2e(tmp_path, monkeypatch):
    """--output_type both: dual-stream decode emits per-utterance VQ audio
    codes alongside the transcription."""
    safetensors = pytest.importorskip("safetensors.numpy")
    import touchnet_tpu.models.kimi_audio.inference_kimi_audio as binary
    from tests.touchnet_tpu.models.test_kimi_audio import TINY
    from touchnet_tpu.models.kimi_audio.configuration_kimi_audio import (
        KimiAudioConfig,
    )
    from touchnet_tpu.models.kimi_audio.convert import params_to_hf_state_dict
    from touchnet_tpu.models.kimi_audio.modeling_kimi_audio import init_params

    tiny = json.loads(json.dumps(TINY))
    tiny["speech_encoder_config"]["max_source_positions"] = 1500
    tiny["speech_tokenizer_config"]["max_source_positions"] = 1500
    config = KimiAudioConfig.from_dict(tiny)
    cfg_json = tmp_path / "config.json"
    cfg_json.write_text(json.dumps(tiny))
    model_dir = _hf_dir(tmp_path, config, init_params,
                        params_to_hf_state_dict, safetensors)
    jsonl = _write_wav_jsonl(tmp_path)

    fake = _FakeTok(
        pinned={
            "<|im_media_begin|>": TINY["kimia_media_begin"],
            "<|im_media_end|>": TINY["kimia_media_end"],
        },
        limit=64,
    )
    monkeypatch.setattr(binary, "build_tokenizer", lambda cfg: fake)

    out_dir = tmp_path / "out"
    binary.main([
        "--model_path", str(model_dir),
        "--training_model_config_path", str(cfg_json),
        "--data_list", str(jsonl),
        "--output_dir", str(out_dir),
        "--batch_size", "2",
        "--max_length", "8",
        "--output_type", "both",
        "--num_workers", "2",
        "--tokenizer_type", "RawTokenizer",
        "--tokenizer_raw_vocab_size", "64",
    ])
    results = [json.loads(l) for l in open(out_dir / "part_0")]
    assert len(results) == 2
    for r in results:
        assert "hyp" in r and "audio_codes" in r
        # VQ codes are de-offset: all within the speech-tokenizer vocab
        assert all(
            0 <= c < config.text_config.vocab_size for c in r["audio_codes"]
        )
