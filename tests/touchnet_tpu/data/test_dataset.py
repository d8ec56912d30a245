# Format-level tests of the TouchDataset .bin/.idx storage.
# Mirrors the reference's md5-golden strategy (tests/touchnet/bin/
# test_make_data.py): the on-disk format must stay bit-stable.

import hashlib
import pickle

import numpy as np
import pytest

from touchnet_tpu.bin.make_data import DataBuilder
from touchnet_tpu.data.dataset import DType, IndexReader, TouchDataset


def _build_shard(tmp_path, arrays, dtype, datatype="texttoken"):
    d = tmp_path / "shard"
    d.mkdir(exist_ok=True)
    builder = DataBuilder(str(d / f"{datatype}.bin"), dtype)
    for a in arrays:
        builder.add_item(np.asarray(a, dtype=dtype))
        builder.end_document()
    builder.finalize(str(d / f"{datatype}.idx"))
    return str(d)


def test_roundtrip_and_partial_reads(tmp_path):
    arrays = [np.arange(10), np.arange(5) + 100, np.array([7])]
    prefix = _build_shard(tmp_path, arrays, np.int32)
    ds = TouchDataset(prefix, mmap=True, datatypes="texttoken")
    assert len(ds) == 3
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(ds.get(i, "texttoken"), a.astype(np.int32))
    # partial reads at token granularity
    np.testing.assert_array_equal(
        ds.get(0, "texttoken", offset=3, length=4), np.arange(3, 7, dtype=np.int32)
    )
    np.testing.assert_array_equal(
        ds.get(1, "texttoken", offset=2), np.arange(102, 105, dtype=np.int32)
    )


def test_file_reader_matches_mmap(tmp_path):
    arrays = [np.arange(64), np.arange(32) * 3]
    prefix = _build_shard(tmp_path, arrays, np.uint16)
    a = TouchDataset(prefix, mmap=True, datatypes="texttoken")
    b = TouchDataset(prefix, mmap=False, datatypes="texttoken")
    for i in range(2):
        np.testing.assert_array_equal(a.get(i, "texttoken"), b.get(i, "texttoken"))


def test_pickle_roundtrip(tmp_path):
    prefix = _build_shard(tmp_path, [np.arange(8)], np.int32)
    ds = TouchDataset(prefix, mmap=True, datatypes="texttoken")
    ds2 = pickle.loads(pickle.dumps(ds))
    np.testing.assert_array_equal(ds2.get(0, "texttoken"), np.arange(8, dtype=np.int32))


def test_optimal_dtype():
    assert DType.optimal_dtype(1000) == np.uint16
    assert DType.optimal_dtype(65499) == np.uint16
    assert DType.optimal_dtype(65500) == np.int32
    assert DType.optimal_dtype(None) == np.int32


def test_format_golden_md5(tmp_path):
    """The serialized format must never change: fixed input -> fixed bytes.
    (Format bit-compatibility with the reference Megatron-lineage layout.)"""
    arrays = [np.arange(17, dtype=np.int32), (np.arange(5, dtype=np.int32) * 2 + 1)]
    prefix = _build_shard(tmp_path, arrays, np.int32)
    idx_md5 = hashlib.md5(open(f"{prefix}/texttoken.idx", "rb").read()).hexdigest()
    bin_md5 = hashlib.md5(open(f"{prefix}/texttoken.bin", "rb").read()).hexdigest()
    assert idx_md5 == "8d05e612428e7fb662a62d1e91a618af", idx_md5
    assert bin_md5 == "5361f98d39f478675bc29795982827f5", bin_md5


def test_index_reader_fields(tmp_path):
    arrays = [np.arange(4), np.arange(6)]
    prefix = _build_shard(tmp_path, arrays, np.int32)
    ix = IndexReader(f"{prefix}/texttoken.idx")
    assert len(ix) == 2
    np.testing.assert_array_equal(ix.sequence_lengths, [4, 6])
    np.testing.assert_array_equal(ix.sequence_pointers, [0, 16])
    np.testing.assert_array_equal(ix.document_indices, [0, 1, 2])


def test_multi_datatype_shard(tmp_path):
    d = tmp_path / "shard"
    d.mkdir()
    audio = DataBuilder(str(d / "audio.bin"), np.int16)
    meta = DataBuilder(str(d / "metainfo.bin"), np.uint8)
    wav = (np.sin(np.arange(1600) / 10) * 10000).astype(np.int16)
    audio.add_item(wav)
    audio.end_document()
    info = np.frombuffer(b'{"key": "u1", "sample_rate": 16000}', dtype=np.uint8)
    meta.add_item(info)
    meta.end_document()
    audio.finalize(str(d / "audio.idx"))
    meta.finalize(str(d / "metainfo.idx"))
    ds = TouchDataset(str(d), datatypes="audio+metainfo")
    np.testing.assert_array_equal(ds.get(0, "audio"), wav)
    assert ds.get(0, "metainfo").tobytes() == info.tobytes()
    # mismatched lengths must be rejected
    audio2 = DataBuilder(str(d / "audiotoken.bin"), np.int32)
    audio2.add_item(np.arange(3))
    audio2.end_document()
    audio2.add_item(np.arange(3))
    audio2.end_document()
    audio2.finalize(str(d / "audiotoken.idx"))
    with pytest.raises(AssertionError):
        TouchDataset(str(d), datatypes="audio+audiotoken")
