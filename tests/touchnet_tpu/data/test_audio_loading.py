# Audio segment loading + random cropping semantics (reference
# datapipe.py:137-165) and their determinism under resume.

import json

import numpy as np

from touchnet_tpu.bin.make_data import DataBuilder
from touchnet_tpu.data import DataConfig
from touchnet_tpu.data.datapipe import LowLevelTouchDatapipe


def build_audio_shard(tmp_path, with_segments=False, n=4, sr=16000, secs=2):
    d = tmp_path / "000000000"
    d.mkdir()
    audio_b = DataBuilder(str(d / "audio.bin"), np.int16)
    meta_b = DataBuilder(str(d / "metainfo.bin"), np.uint8)
    rng = np.random.default_rng(0)
    for i in range(n):
        wav = (rng.standard_normal(sr * secs) * 5000).astype(np.int16)
        meta = {"key": f"u{i}", "sample_rate": sr, "txt": f"t{i}"}
        if with_segments:
            meta["info"] = {"segments": [
                {"start": 0.0, "end": 0.5, "txt": "a"},
                {"start": 0.5, "end": 1.5, "txt": "b"},
            ]}
        audio_b.add_item(wav)
        audio_b.end_document()
        meta_b.add_item(np.frombuffer(
            json.dumps(meta).encode("utf8"), np.uint8).copy())
        meta_b.end_document()
    audio_b.finalize(str(d / "audio.idx"))
    meta_b.finalize(str(d / "metainfo.idx"))
    lf = tmp_path / "data.list"
    lf.write_text(f"{d} audio+metainfo\n")
    return str(lf)


def test_segment_loading(tmp_path):
    lf = build_audio_shard(tmp_path, with_segments=True)
    cfg = DataConfig(datalist_path=lf, datalist_shuffling=False,
                     dataset_shuffling=False, datalist_epoch=1,
                     dataset_load_audio_via_segments=True)
    out = list(LowLevelTouchDatapipe(cfg, 0, 1))
    assert len(out) == 4
    for s in out:
        dur = s["waveform"].shape[1] / s["sample_rate"]
        assert abs(dur - 0.5) < 1e-6 or abs(dur - 1.0) < 1e-6
        assert s["txt"] in ("a", "b")


def test_random_cut_audio(tmp_path):
    lf = build_audio_shard(tmp_path, secs=3)
    cfg = DataConfig(datalist_path=lf, datalist_shuffling=False,
                     dataset_shuffling=False, datalist_epoch=1,
                     dataset_random_cut_audio=True,
                     dataset_random_cut_audio_min_length_in_ms=500,
                     dataset_random_cut_audio_max_length_in_ms=1000)
    out = list(LowLevelTouchDatapipe(cfg, 0, 1))
    for s in out:
        ms = s["waveform"].shape[1] / s["sample_rate"] * 1000
        assert 500 <= ms <= 1000
    # deterministic by (epoch, consumed counters): re-iteration identical
    out2 = list(LowLevelTouchDatapipe(cfg, 0, 1))
    for a, b in zip(out, out2):
        np.testing.assert_array_equal(a["waveform"], b["waveform"])
