"""User-facing pipeline + CLI smoke: full tokens->image flow with random
weights, task surface, and the CLI writing an image file."""

import numpy as np
import pytest

from x2i_tpu import cli
from x2i_tpu.pipeline import build_random_pipeline


@pytest.fixture(scope="module")
def pipe():
    return build_random_pipeline("tiny")


def test_text2image(pipe):
    img = pipe.text2image("a red cat", seed=1)
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8


def test_prompt_changes_image(pipe):
    a = pipe.text2image("a red cat", seed=1)
    b = pipe.text2image("a blue dog", seed=1)
    assert not np.array_equal(a, b)


def test_seed_changes_image(pipe):
    a = pipe.text2image("a red cat", seed=1)
    b = pipe.text2image("a red cat", seed=2)
    assert not np.array_equal(a, b)
    c = pipe.text2image("a red cat", seed=1)
    np.testing.assert_array_equal(a, c)   # deterministic per seed


def test_task_surface(pipe):
    for task in ("text2image", "image2image", "imagetext2image",
                 "video2image", "audio2image", "x2image"):
        img = pipe.run_task(task, prompt="hi")
        assert img.shape == (1, 64, 64, 3)


def test_cli_writes_image(tmp_path):
    out = str(tmp_path / "img.png")
    rc = cli.main(["--task", "text2image", "--prompt", "a cat",
                   "--random-weights", "tiny", "--num_steps", "2",
                   "--output", out])
    assert rc == 0
    from PIL import Image
    img = Image.open(out)
    assert img.size == (64, 64)


def test_cli_requires_prompt():
    rc = cli.main(["--task", "text2image", "--random-weights", "tiny"])
    assert rc == 2


def test_cli_requires_checkpoints_without_random():
    rc = cli.main(["--task", "text2image", "--prompt", "x"])
    assert rc == 2
