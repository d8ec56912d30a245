# The reference declares five datatype modes (reference touchnet/bin/
# __init__.py:50-61) but implements builders for two (make_data.py:244-249
# raises NotImplementedError otherwise); here ALL declared modes build, plus
# '+'-combinations. These tests pin:
#   - audio / metainfo / audiotoken single-type shards build and round-trip
#   - offline BestRQ codes (audiotoken) are value-identical to online
#     tokenization through the SAME datapipe chain
#   - the touch_audio pretrain datapipe consumes audio+metainfo+audiotoken
#     shards and yields bit-identical batches to online tokenization
#   - audiotoken-only shards feed the causal_lm path like texttoken shards

import json

import numpy as np
import pytest
from scipy.io import wavfile

from touchnet_tpu.bin.make_data import main as make_data_main
from touchnet_tpu.data import DataConfig
from touchnet_tpu.data.datapipe import LowLevelTouchDatapipe
from touchnet_tpu.tokenizer import TokenizerConfig
from touchnet_tpu.tokenizer.tokenizer import build_tokenizer

BESTRQ_ARGS = [
    "--audiofeat_num_mel_bins", "80",
    "--tokenizer_type", "BestRQTokenizer",
    "--tokenizer_bestrq_vocab_size", "64",
    "--tokenizer_bestrq_input_size", "560",
    "--tokenizer_bestrq_init_seed", "7",
]


def _write_corpus(tmp_path, n=3, seconds=1.0):
    rng = np.random.default_rng(0)
    jsonl = tmp_path / "data.jsonl"
    wavs = {}
    with open(jsonl, "w") as f:
        for i in range(n):
            wav = (rng.standard_normal(int(16000 * seconds)) * 5000).astype(
                np.int16
            )
            path = tmp_path / f"utt{i}.wav"
            wavfile.write(path, 16000, wav)
            wavs[f"utt{i}"] = wav
            f.write(json.dumps(
                {"key": f"utt{i}", "wav": str(path), "txt": f"text {i}"}
            ) + "\n")
    return jsonl, wavs


def _pipe_cfg(save_dir, **kw):
    return DataConfig(
        datalist_path=str(save_dir / "data.list"),
        datalist_shuffling=False,
        dataset_shuffling=False,
        datalist_epoch=1,
        **kw,
    )


def test_audio_only_shards(tmp_path):
    jsonl, wavs = _write_corpus(tmp_path)
    save_dir = tmp_path / "shards"
    make_data_main([
        "--save_dir", str(save_dir), "--jsonl_path", str(jsonl),
        "--num_utt_per_shard", "2", "--num_workers", "1",
        "--datatypes", "audio",
    ])
    assert (save_dir / "000000000" / "audio.bin").exists()
    assert not (save_dir / "000000000" / "metainfo.bin").exists()
    pipe = LowLevelTouchDatapipe(_pipe_cfg(save_dir), 0, 1)
    got = [np.asarray(s["waveform"][0] * 32768.0, np.int16) for s in pipe]
    assert len(got) == 3
    # no metainfo: order within a shard is the build order
    np.testing.assert_array_equal(got[0], wavs["utt0"])


def test_metainfo_only_shards(tmp_path):
    jsonl, _ = _write_corpus(tmp_path)
    save_dir = tmp_path / "shards"
    make_data_main([
        "--save_dir", str(save_dir), "--jsonl_path", str(jsonl),
        "--num_utt_per_shard", "2", "--num_workers", "1",
        "--datatypes", "metainfo",
    ])
    assert (save_dir / "000000000" / "metainfo.bin").exists()
    assert not (save_dir / "000000000" / "audio.bin").exists()
    pipe = LowLevelTouchDatapipe(_pipe_cfg(save_dir), 0, 1)
    keys = sorted(s["key"] for s in pipe)
    assert keys == ["utt0", "utt1", "utt2"]


def test_offline_audiotoken_matches_online(tmp_path):
    jsonl, _ = _write_corpus(tmp_path)
    save_dir = tmp_path / "shards"
    make_data_main([
        "--save_dir", str(save_dir), "--jsonl_path", str(jsonl),
        "--num_utt_per_shard", "2", "--num_workers", "1",
        "--datatypes", "audio+metainfo+audiotoken",
        "--audiofeat_dither", "0.0",
    ] + BESTRQ_ARGS)
    for name in ("audio", "metainfo", "audiotoken"):
        assert (save_dir / "000000000" / f"{name}.bin").exists()

    from touchnet_tpu.data import functions

    tok = build_tokenizer(TokenizerConfig(
        tokenizer_type="BestRQTokenizer",
        tokenizer_bestrq_vocab_size=64,
        tokenizer_bestrq_input_size=560,
        tokenizer_bestrq_init_seed=7,
    ))
    cfg = _pipe_cfg(save_dir, audio_speed_perturb=False, audiofeat_dither=0.0, audiofeat_num_mel_bins=80)
    pipe = LowLevelTouchDatapipe(cfg, 0, 1)
    n = 0
    for sample in pipe:
        # recompute codes online through the same chain the builder used
        s = dict(sample)
        s = next(functions.audio_compute_fbank(iter([s]), cfg))
        s = next(functions.audiofeat_stack(iter([s]), cfg))
        online = np.asarray(tok.tokenize(s["audiofeat"]), np.int32)
        np.testing.assert_array_equal(sample["audiotoken"], online)
        n += 1
    assert n == 3


def test_touch_audio_datapipe_offline_equals_online(tmp_path):
    from touchnet_tpu.models.touch_audio.processing_touch_audio import (
        touch_audio_datapipe,
    )

    jsonl, _ = _write_corpus(tmp_path)
    offline_dir = tmp_path / "offline"
    online_dir = tmp_path / "online"
    for d, types in ((offline_dir, "audio+metainfo+audiotoken"),
                     (online_dir, "audio+metainfo")):
        make_data_main([
            "--save_dir", str(d), "--jsonl_path", str(jsonl),
            "--num_utt_per_shard", "2", "--num_workers", "1",
            "--datatypes", types, "--audiofeat_dither", "0.0",
        ] + BESTRQ_ARGS)

    tok = build_tokenizer(TokenizerConfig(
        tokenizer_type="BestRQTokenizer",
        tokenizer_bestrq_vocab_size=64,
        tokenizer_bestrq_input_size=560,
        tokenizer_bestrq_init_seed=7,
    ))

    def batches(d):
        cfg = _pipe_cfg(
            d,
            audio_speed_perturb=False,
            audiofeat_dither=0.0,
            audiofeat_spec_aug=False,
            audiofeat_spec_sub=False,
            audiofeat_num_mel_bins=80,
            dataset_enable_pack=True,
            dataset_batchsize=1,
            dataset_audio_seqlen=64,
            dataloader_drop_last_batch=False,
        )
        return list(touch_audio_datapipe(cfg, tok, 0, 1))

    off, on = batches(offline_dir), batches(online_dir)
    assert len(off) == len(on) > 0
    for a, b in zip(off, on):
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_allclose(a["input_features"], b["input_features"])
        np.testing.assert_array_equal(a["attention_mask"], b["attention_mask"])


def test_audiotoken_only_feeds_causal_lm(tmp_path):
    jsonl, _ = _write_corpus(tmp_path)
    save_dir = tmp_path / "shards"
    make_data_main([
        "--save_dir", str(save_dir), "--jsonl_path", str(jsonl),
        "--num_utt_per_shard", "2", "--num_workers", "1",
        "--datatypes", "audiotoken", "--audiofeat_dither", "0.0",
    ] + BESTRQ_ARGS)
    assert (save_dir / "000000000" / "audiotoken.bin").exists()
    assert not (save_dir / "000000000" / "audio.bin").exists()
    pipe = LowLevelTouchDatapipe(_pipe_cfg(save_dir), 0, 1)
    samples = list(pipe)
    assert len(samples) == 3
    for s in samples:
        assert len(s["input_ids"]) > 0
        assert all(0 <= t < 64 for t in s["input_ids"])


def test_partial_read_paths_rejected_with_audiotoken(tmp_path):
    jsonl, _ = _write_corpus(tmp_path)
    save_dir = tmp_path / "shards"
    make_data_main([
        "--save_dir", str(save_dir), "--jsonl_path", str(jsonl),
        "--num_utt_per_shard", "2", "--num_workers", "1",
        "--datatypes", "audio+metainfo+audiotoken",
        "--audiofeat_dither", "0.0",
    ] + BESTRQ_ARGS)
    cfg = _pipe_cfg(save_dir, audio_speed_perturb=True)
    pipe = LowLevelTouchDatapipe(cfg, 0, 1)
    with pytest.raises(ValueError, match="audiotoken"):
        next(iter(pipe))


def test_bad_datatypes_rejected(tmp_path):
    jsonl, _ = _write_corpus(tmp_path, n=1)
    with pytest.raises(NotImplementedError):
        make_data_main([
            "--save_dir", str(tmp_path / "s"), "--jsonl_path", str(jsonl),
            "--datatypes", "audio+audio",
        ])
    with pytest.raises(NotImplementedError):
        make_data_main([
            "--save_dir", str(tmp_path / "s2"), "--jsonl_path", str(jsonl),
            "--datatypes", "video",
        ])
