# Resume-exactness tests of the stateful dataloader, mirroring the
# reference's strategy (tests/touchnet/data/test_dataloader.py): build
# synthetic texttoken shards with known contents, iterate to a break point,
# snapshot state, rebuild, and require the resumed stream to equal the
# remainder of the original stream exactly.

import numpy as np
import pytest

from touchnet_tpu.bin.make_data import DataBuilder
from touchnet_tpu.data import DataConfig
from touchnet_tpu.data.dataloader import ParallelAwareDataloader
from touchnet_tpu.data.datapipe import LowLevelTouchDatapipe


def build_fake_data(tmp_path, num_shards=4, samples_per_shard=8):
    """Shard s sample i = [s * 100 + i] (single-token sequences)."""
    paths = []
    for s in range(num_shards):
        d = tmp_path / f"{s:09d}"
        d.mkdir()
        b = DataBuilder(str(d / "texttoken.bin"), np.int32)
        for i in range(samples_per_shard):
            b.add_item(np.array([s * 100 + i], dtype=np.int32))
            b.end_document()
        b.finalize(str(d / "texttoken.idx"))
        paths.append(str(d))
    listfile = tmp_path / "data.list"
    with open(listfile, "w") as f:
        for p in paths:
            f.write(f"{p} texttoken\n")
    return str(listfile)


def make_config(listfile, **kw):
    cfg = DataConfig(
        datalist_path=listfile,
        datalist_epoch=kw.pop("epochs", 2),
        datalist_shuffling=kw.pop("list_shuffle", True),
        dataset_shuffling=kw.pop("sample_shuffle", True),
        dataloader_num_workers=kw.pop("num_workers", 2),
        **kw,
    )
    return cfg


def collect_ids(loader, limit=None):
    out = []
    for i, batch in enumerate(loader):
        out.append(batch["input_ids"][0])
        if limit is not None and i + 1 >= limit:
            break
    return out


@pytest.mark.parametrize("num_workers", [1, 2])
@pytest.mark.parametrize("dp_world", [1, 2])
@pytest.mark.parametrize("epochs", [1, 2])
@pytest.mark.parametrize("break_point", [0, 3, 7])
def test_resume_exactness(tmp_path, num_workers, dp_world, epochs, break_point):
    listfile = build_fake_data(tmp_path)

    def make_loader():
        cfg = make_config(listfile, epochs=epochs, num_workers=num_workers)

        def factory(worker_id, n):
            return LowLevelTouchDatapipe(cfg, 0, dp_world, worker_id, n)

        return ParallelAwareDataloader(
            factory, dp_rank=0, dp_world_size=dp_world,
            num_workers=num_workers, threaded=False,
        )

    # golden full stream
    golden = collect_ids(make_loader())
    assert len(golden) > break_point

    # run to break point, snapshot, rebuild, resume
    loader = make_loader()
    consumed = collect_ids(loader, limit=break_point) if break_point else []
    state = loader.state_dict()
    resumed_loader = make_loader()
    resumed_loader.load_state_dict(state)
    rest = collect_ids(resumed_loader)
    assert consumed + rest == golden


def test_threaded_matches_sync(tmp_path):
    listfile = build_fake_data(tmp_path)

    def make_loader(threaded):
        cfg = make_config(listfile, epochs=1, num_workers=2)

        def factory(worker_id, n):
            return LowLevelTouchDatapipe(cfg, 0, 1, worker_id, n)

        return ParallelAwareDataloader(
            factory, dp_rank=0, dp_world_size=1, num_workers=2, threaded=threaded
        )

    assert collect_ids(make_loader(False)) == collect_ids(make_loader(True))


def test_threaded_resume(tmp_path):
    """Prefetched-but-unconsumed batches must be replayed after resume."""
    listfile = build_fake_data(tmp_path)

    def make_loader():
        cfg = make_config(listfile, epochs=1, num_workers=2)

        def factory(worker_id, n):
            return LowLevelTouchDatapipe(cfg, 0, 1, worker_id, n)

        return ParallelAwareDataloader(
            factory, dp_rank=0, dp_world_size=1, num_workers=2,
            threaded=True, prefetch_factor=4,
        )

    golden = collect_ids(make_loader())
    loader = make_loader()
    consumed = collect_ids(loader, limit=5)
    import time
    time.sleep(0.2)  # let prefetch run ahead; state must not include it
    state = loader.state_dict()
    loader.shutdown()
    resumed = make_loader()
    resumed.load_state_dict(state)
    rest = collect_ids(resumed)
    assert consumed + rest == golden


def test_dp_ranks_partition_data(tmp_path):
    """dp ranks must see disjoint shard stripes covering everything."""
    listfile = build_fake_data(tmp_path, num_shards=4)
    streams = []
    for rank in range(2):
        cfg = make_config(
            listfile, epochs=1, num_workers=1, list_shuffle=False, sample_shuffle=False
        )

        def factory(worker_id, n, rank=rank):
            return LowLevelTouchDatapipe(cfg, rank, 2, worker_id, n)

        loader = ParallelAwareDataloader(
            factory, dp_rank=rank, dp_world_size=2, num_workers=1, threaded=False
        )
        streams.append(collect_ids(loader))
    assert not (set(streams[0]) & set(streams[1]))
    assert len(streams[0]) + len(streams[1]) == 32


def test_world_size_guard(tmp_path):
    listfile = build_fake_data(tmp_path)
    cfg = make_config(listfile, epochs=1, num_workers=1)

    def factory(worker_id, n):
        return LowLevelTouchDatapipe(cfg, 0, 1, worker_id, n)

    loader = ParallelAwareDataloader(factory, 0, 1, num_workers=1, threaded=False)
    state = loader.state_dict()
    loader2 = ParallelAwareDataloader(factory, 0, 2, num_workers=1, threaded=False)
    with pytest.raises(AssertionError):
        loader2.load_state_dict(state)


def test_get_epoch(tmp_path):
    listfile = build_fake_data(tmp_path)
    cfg = make_config(listfile, epochs=2, num_workers=1)

    def factory(worker_id, n):
        return LowLevelTouchDatapipe(cfg, 0, 1, worker_id, n)

    loader = ParallelAwareDataloader(factory, 0, 1, num_workers=1, threaded=False)
    assert loader.get_epoch() == 0
    collect_ids(loader)
    assert loader.get_epoch() == 2
