# HF -> seed ckpt -> HF round trip (reference recipe stages 1 and 3,
# convert_hf_to_dcp.py / convert_dcp_to_hf.py).

import json
import os

import numpy as np
import pytest

CFG = os.path.join(
    os.path.dirname(__file__), "..", "..", "assets", "config", "tiny_llama.json"
)


@pytest.mark.slow
def test_hf_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from touchnet_tpu.bin.convert_hf_to_ckpt import main as hf2ckpt
    from touchnet_tpu.bin.convert_ckpt_to_hf import main as ckpt2hf

    cfg = json.load(open(CFG))
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        num_key_value_heads=cfg["num_key_value_heads"],
        rms_norm_eps=cfg["rms_norm_eps"],
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg)
    hf_dir = tmp_path / "hf_model"
    model.save_pretrained(hf_dir, safe_serialization=True)

    ckpt_dir = tmp_path / "exp"
    hf2ckpt([
        "--huggingface_model", str(hf_dir),
        "--ckpt_dir", str(ckpt_dir),
        "--training_model_config_path", CFG,
        "--model_type", "causal_lm",
    ])
    assert os.path.exists(ckpt_dir / "checkpoint" / "step_0")

    ckpt2hf([
        "--ckpt_dir", str(ckpt_dir),
        "--training_model_config_path", CFG,
        "--model_type", "causal_lm",
        "--step", "0",
    ])
    out_dir = ckpt_dir / "checkpoint_hf" / "step-0"
    reloaded = transformers.LlamaForCausalLM.from_pretrained(out_dir)
    want = model.state_dict()
    got = reloaded.state_dict()
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_allclose(
            got[k].float().numpy(), want[k].float().numpy(), atol=1e-6,
            err_msg=k,
        )


@pytest.mark.slow
def test_seed_ckpt_feeds_trainer(tmp_path):
    """Converted step-0 must load as a model-only seed in the trainer
    (training_ckpt_load_step=0 flow)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from touchnet_tpu.bin.convert_hf_to_ckpt import main as hf2ckpt

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_train import build_corpus, make_args, run_trainer

    cfg = json.load(open(CFG))
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        num_key_value_heads=cfg["num_key_value_heads"],
        rms_norm_eps=cfg["rms_norm_eps"], tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(hf_cfg)
    hf_dir = tmp_path / "hf_model"
    model.save_pretrained(hf_dir, safe_serialization=True)

    exp_dir = tmp_path / "exp"
    hf2ckpt([
        "--huggingface_model", str(hf_dir),
        "--ckpt_dir", str(exp_dir),
        "--training_model_config_path", CFG,
        "--model_type", "causal_lm",
    ])

    listfile = build_corpus(tmp_path)
    argv = make_args(
        tmp_path, listfile, steps=2,
        training_enable_ckpt=True, training_ckpt_load_step=0,
        training_ckpt_interval=100,
    )
    trainer = run_trainer(argv)
    assert trainer.step == 2
