"""Multi-turn REPL subcommand + --use_answer wiring.

Parity targets: /root/reference/infer/inference_multi_turn.py:80-165 (REPL
semantics: empty input rejected, 'stop' exits, one image per turn with a
fixed seed) and /root/reference/infer/inference_qwenvl.py:121-132
(reasoning2image conditions on cat(prefill, answer) hidden states).
"""

import numpy as np
import pytest

from x2i_tpu import cli
from x2i_tpu.multiturn import build_random_session
from x2i_tpu.pipeline import build_random_pipeline


def test_multiturn_repl_three_turns(tmp_path, monkeypatch, capsys):
    """`x2i_tpu.cli multiturn` round-trips a 3-turn session with random
    weights: 3 images written, empty input rejected, 'stop' exits."""
    lines = iter(["a red cat", "", "make it blue", "add a hat", "stop"])
    monkeypatch.setattr("builtins.input", lambda _="": next(lines))
    prefix = str(tmp_path / "mt_")
    rc = cli.main(["multiturn", "--random-weights", "tiny",
                   "--output_prefix", prefix])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Query should not be empty!" in out
    from PIL import Image
    for turn in (1, 2, 3):
        img = Image.open(f"{prefix}{turn}.png")
        assert img.size == (64, 64)
    assert not (tmp_path / "mt_4.png").exists()


@pytest.mark.slow
def test_multiturn_history_changes_conditioning():
    """The same user message after different histories produces different
    images (history is part of the prompt), and the per-session seed is
    fixed so the differences come from conditioning alone."""
    s1 = build_random_session(seed=0)
    _, img_fresh = s1.turn("draw a dog")

    s2 = build_random_session(seed=0)
    s2.turn("a red cat")
    _, img_after_history = s2.turn("draw a dog")

    assert not np.array_equal(np.asarray(img_fresh),
                              np.asarray(img_after_history))


@pytest.mark.slow
def test_multiturn_eof_exits(monkeypatch):
    def raise_eof(_=""):
        raise EOFError
    monkeypatch.setattr("builtins.input", raise_eof)
    assert cli.main(["multiturn", "--random-weights", "tiny"]) == 0


def test_use_answer_changes_conditioning():
    """use_answer concatenates decode-step hiddens: the conditioning
    sequence grows and the image differs from the prefill-only one."""
    pipe = build_random_pipeline("tiny")
    plain = pipe.run_task("text2image", prompt="a cat", seed=3)
    answered = pipe.run_task("text2image", prompt="a cat", seed=3,
                             use_answer=True)
    assert not np.array_equal(plain, answered)


@pytest.mark.slow
def test_use_answer_cli(tmp_path):
    out = str(tmp_path / "ua.png")
    rc = cli.main(["--task", "text2image", "--prompt", "a cat",
                   "--use_answer", "--random-weights", "tiny",
                   "--num_steps", "2", "--output", out])
    assert rc == 0
    from PIL import Image
    assert Image.open(out).size == (64, 64)


@pytest.mark.slow
def test_use_answer_rejected_off_family():
    """Non-Qwen encoder families reject use_answer loudly (it is an
    inference_qwenvl.py-only feature)."""
    pipe = build_random_pipeline("tiny")

    def encoder_fn(inputs):
        if inputs.get("use_answer"):
            raise ValueError("use_answer is a Qwen2.5-VL feature")
        raise AssertionError("should have raised on use_answer")

    import dataclasses
    pipe2 = dataclasses.replace(pipe, encoder_fn=encoder_fn)
    with pytest.raises(ValueError, match="Qwen2.5-VL"):
        pipe2.run_task("text2image", prompt="x", use_answer=True)
