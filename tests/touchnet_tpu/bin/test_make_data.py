# End-to-end make_data test (reference tests/touchnet/bin/test_make_data.py):
# synthesize wavs, run the CLI main, round-trip through the datapipe, and
# compare waveforms bit-exactly.

import json

import numpy as np
from scipy.io import wavfile

from touchnet_tpu.bin.make_data import main as make_data_main
from touchnet_tpu.data import DataConfig
from touchnet_tpu.data.datapipe import LowLevelTouchDatapipe


def test_make_data_audio_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wavs = {}
    jsonl = tmp_path / "data.jsonl"
    with open(jsonl, "w") as f:
        for i in range(3):
            wav = (rng.standard_normal(16000) * 5000).astype(np.int16)
            path = tmp_path / f"utt{i}.wav"
            wavfile.write(path, 16000, wav)
            wavs[f"utt{i}"] = wav
            f.write(json.dumps({"key": f"utt{i}", "wav": str(path), "txt": f"text {i}"}) + "\n")

    save_dir = tmp_path / "shards"
    make_data_main([
        "--save_dir", str(save_dir),
        "--jsonl_path", str(jsonl),
        "--num_utt_per_shard", "2",
        "--num_workers", "1",
        "--datatypes", "audio+metainfo",
    ])

    lines = open(save_dir / "data.list").read().strip().splitlines()
    assert len(lines) == 2  # 3 utts, 2 per shard

    cfg = DataConfig(
        datalist_path=str(save_dir / "data.list"),
        datalist_shuffling=False,
        dataset_shuffling=False,
        datalist_epoch=1,
    )
    pipe = LowLevelTouchDatapipe(cfg, 0, 1)
    seen = {}
    for sample in pipe:
        seen[sample["key"]] = (sample["waveform"] * 32768.0).astype(np.int16)[0]
        assert sample["sample_rate"] == 16000
        assert sample["txt"].startswith("text")
    assert set(seen) == set(wavs)
    for k in wavs:
        np.testing.assert_array_equal(seen[k], wavs[k])
