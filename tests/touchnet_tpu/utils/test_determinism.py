# Seed determinism: same seed -> identical training trajectory.

import os
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_same_seed_same_losses(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "bin"))
    from test_train import build_corpus, make_args
    from touchnet_tpu.bin import TrainConfig
    from touchnet_tpu.bin.train import Trainer
    from touchnet_tpu.data import DataConfig
    from touchnet_tpu.tokenizer import TokenizerConfig
    from touchnet_tpu.utils.cli import parse_args_into_dataclasses

    listfile = build_corpus(tmp_path)

    def run(tag):
        argv = make_args(
            tmp_path, listfile, steps=3,
            training_trace_dump_folder=str(tmp_path / tag),
        )
        tok, data, job = parse_args_into_dataclasses(
            [TokenizerConfig, DataConfig, TrainConfig], argv
        )
        trainer = Trainer(tok, data, job)
        losses = []
        import jax

        data_iter = iter(trainer.dataloader)
        for step in range(1, 4):
            batch = next(data_iter)
            db, ns = trainer._put_batch(batch)
            trainer.params, trainer.opt_state, m = trainer.train_step_fn(
                trainer.params, trainer.opt_state, db, ns, step
            )
            losses.append(float(jax.device_get(m["loss/per_sample"])))
        trainer.close()
        return losses

    a = run("a")
    b = run("b")
    np.testing.assert_array_equal(a, b)
