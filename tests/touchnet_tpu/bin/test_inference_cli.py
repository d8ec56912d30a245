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
        "--tokenizer_type", "RawTokenizer",
        "--tokenizer_raw_vocab_size", "64",
        "--audiofeat_num_mel_bins", "23",
    ])
    results = [json.loads(l) for l in open(out_dir / "part_0")]
    assert len(results) == 3
    assert all("hyp" in r and r["key"].startswith("u") for r in results)
