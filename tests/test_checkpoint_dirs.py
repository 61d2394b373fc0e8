"""End-to-end rehearsal of the real-checkpoint path.

Builds synthetic checkpoint DIRECTORIES in exactly the released layouts
(tests/ckpt_fixtures.py) and drives
convert/load.py::build_pipeline_from_checkpoints AND the CLI through them
to a decoded image, for all three encoder families — the path real
weights take on arrival (reference entry:
/root/reference/infer/inference_minicpm.py:51-91). Architecture comes
from each directory's own config files (convert/hf_config.py), so these
tiny fixtures exercise the same parsing the full-size dirs will.
"""

import os

import numpy as np
import pytest

from ckpt_fixtures import (PROJ_DIMS, REGISTRY_NAME, build_family_checkpoints,
                           build_flux_dir, build_proj_bin)

GEN = dict(num_steps=2, height=64, width=64)


def _img(seed=3, size=24):
    from PIL import Image
    r = np.random.default_rng(seed)
    return Image.fromarray((r.random((size, size, 3)) * 255)
                           .astype(np.uint8))


@pytest.fixture(scope="module")
def family_pipeline(tmp_path_factory):
    """family -> (pipe, paths); built once per family per module."""
    from x2i_tpu.convert.load import build_pipeline_from_checkpoints
    cache = {}

    def get(family):
        if family not in cache:
            root = str(tmp_path_factory.mktemp(f"ckpt_{family}"))
            flux, mllm, proj, model = build_family_checkpoints(root, family)
            pipe = build_pipeline_from_checkpoints(
                model=model, flux_path=flux, mllm_path=mllm,
                proj_path=proj, num_steps=2, height=64, width=64)
            cache[family] = (pipe, (flux, mllm, proj, model))
        return cache[family]

    return get


@pytest.mark.parametrize("family", ["qwenvl", "internvl", "minicpm"])
def test_text2image_from_checkpoint_dirs(family_pipeline, family):
    pipe, _ = family_pipeline(family)
    out = pipe.run_task("text2image", prompt="a lighthouse at dusk", **GEN)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    assert len(np.unique(out)) > 1           # decoded, not constant


@pytest.mark.parametrize("family", ["qwenvl", "internvl", "minicpm"])
def test_imagetext2image_from_checkpoint_dirs(family_pipeline, family):
    pipe, _ = family_pipeline(family)
    out = pipe.run_task("imagetext2image", prompt="make it snowy",
                        images=[_img()], **GEN)
    assert out.shape == (1, 64, 64, 3)


def test_video2image_through_prep(family_pipeline):
    """A video request through the REAL _prep (placeholder expansion must
    keep <|video_pad|> tokens so get_rope_index sees the video grid —
    regression for the load.py:426 placeholder bug)."""
    pipe, _ = family_pipeline("qwenvl")
    frames = [_img(seed=10 + i, size=16) for i in range(4)]
    out = pipe.run_task("video2image", video=frames, **GEN)
    assert out.shape == (1, 64, 64, 3)


def test_use_answer_from_checkpoint_dirs(family_pipeline):
    """reasoning2image through the real checkpoint path: --use_answer
    decodes an answer with the fixture tokenizer's eos and conditions on
    cat(prefill, answer) hidden states (inference_qwenvl.py:121-132).
    The conditioning sequence grows past 512, so this also pins the
    proj/DiT txt-length flexibility of the assembled pipeline."""
    pipe, _ = family_pipeline("qwenvl")
    out = pipe.run_task("text2image", prompt="why is the sky blue?",
                        use_answer=True, **GEN)
    assert out.shape == (1, 64, 64, 3)


def test_minicpm_audio_from_checkpoint_dirs(family_pipeline):
    pipe, _ = family_pipeline("minicpm")
    r = np.random.default_rng(0)
    audio = (r.standard_normal(2 * 16000) * 0.1).astype(np.float32)
    out = pipe.run_task("x2image", prompt="what does this sound like?",
                        audio=audio, **GEN)
    assert out.shape == (1, 64, 64, 3)


def test_qwenvl_batched_encode_through_prep(family_pipeline):
    """Mixed text/image/video batch through the production
    encoder_batch_fn (REAL _prep + tokenizer, not hand-built ids) equals
    serial encodes — the end-to-end pin the batched-video path lacked."""
    import jax.numpy as jnp
    pipe, _ = family_pipeline("qwenvl")
    reqs = [
        {"task": "imagetext2image", "prompt": "p0", "images": [_img(1)]},
        {"task": "text2image", "prompt": "just text"},
        {"task": "video2image",
         "video": [_img(20 + i, size=16) for i in range(4)]},
    ]
    batch_fn = pipe.encoder_batch_fn
    batched = np.asarray(batch_fn(reqs), np.float32)
    serial = np.asarray(
        jnp.concatenate([batch_fn([r]) for r in reqs], axis=0), np.float32)
    assert batched.shape[0] == 3
    np.testing.assert_allclose(batched, serial, atol=2e-2, rtol=2e-2)


def test_internvl_batched_encode_matches_serial(family_pipeline):
    """Mixed text/image batch through the internvl encoder_batch_fn
    (real tokenizer + tiling from the checkpoint dir) equals serial."""
    import jax.numpy as jnp
    pipe, _ = family_pipeline("internvl")
    reqs = [
        {"task": "imagetext2image", "prompt": "p0", "images": [_img(2)]},
        {"task": "text2image", "prompt": "text only"},
        {"task": "imagetext2image", "prompt": "p2", "images": [_img(4)]},
    ]
    batch_fn = pipe.encoder_batch_fn
    batched = np.asarray(batch_fn(reqs), np.float32)
    serial = np.asarray(
        jnp.concatenate([batch_fn([q]) for q in reqs], axis=0), np.float32)
    assert batched.shape[0] == 3
    np.testing.assert_allclose(batched, serial, atol=2e-2, rtol=2e-2)


def test_minicpm_batched_omni_encode_matches_serial(family_pipeline):
    """Mixed text/image/audio batch through the minicpm
    encoder_batch_fn — ONE prefill + one vision call + one whisper call —
    equals serial encodes, including audios of DIFFERENT lengths (mel
    time padding across requests must be inert: padded frames are masked
    keys and row indices re-derive from the common conv length)."""
    import jax.numpy as jnp
    pipe, _ = family_pipeline("minicpm")
    r = np.random.default_rng(5)
    reqs = [
        {"task": "x2image", "prompt": "short clip",
         "audio": (r.standard_normal(16000) * 0.1).astype(np.float32)},
        {"task": "text2image", "prompt": "just text"},
        {"task": "imagetext2image", "prompt": "an image", "images": [_img()]},
        {"task": "x2image", "prompt": "img+longer audio",
         "images": [_img(9)],
         "audio": (r.standard_normal(3 * 16000) * 0.1).astype(np.float32)},
        # >30s: TWO mel chunks -> ~800 placeholder tokens, over the 512
        # budget — exercises the truncation guard (whole batch falls
        # back to serial, matching the reference's per-request behavior)
        {"task": "audio2image",
         "audio": (r.standard_normal(32 * 16000) * 0.1).astype(np.float32)},
    ]
    batch_fn = pipe.encoder_batch_fn
    batched = np.asarray(batch_fn(reqs), np.float32)
    serial = np.asarray(
        jnp.concatenate([batch_fn([q]) for q in reqs], axis=0), np.float32)
    assert batched.shape[0] == 5
    np.testing.assert_allclose(batched, serial, atol=2e-2, rtol=2e-2)


def test_cli_text2image_from_dirs(family_pipeline, tmp_path):
    """python -m x2i_tpu.cli --task text2image --flux_path ... writes a
    decoded png (reference CLI contract, inference_minicpm.py:218-335)."""
    from x2i_tpu.cli import main
    _, (flux, mllm, proj, model) = family_pipeline("internvl")
    out = str(tmp_path / "out.png")
    rc = main(["--task", "text2image", "--prompt", "a red boat",
               "--flux_path", flux, "--mllm_path", mllm,
               "--proj_path", proj, "--model", model,
               "--num_steps", "2", "--height", "64", "--width", "64",
               "--output", out])
    assert rc in (0, None)
    from PIL import Image
    im = Image.open(out)
    assert im.size == (64, 64)


@pytest.mark.parametrize("mode", ["w8a8", "w4a8"])
def test_cli_quantize_flag(family_pipeline, tmp_path, mode):
    """--quantize builds the int8-activation / int4-stored pipelines end
    to end (the serving default is w8; flagship single-chip uses
    w4a8)."""
    from x2i_tpu.cli import main
    _, (flux, mllm, proj, model) = family_pipeline("internvl")
    out = str(tmp_path / f"q_{mode}.png")
    rc = main(["--task", "text2image", "--prompt", "a pier",
               "--flux_path", flux, "--mllm_path", mllm,
               "--proj_path", proj, "--model", model,
               "--quantize", mode,
               "--num_steps", "2", "--height", "64", "--width", "64",
               "--output", out])
    assert rc in (0, None) and os.path.exists(out)


def test_cli_video2image_from_dirs(family_pipeline, tmp_path):
    """CLI video task through real checkpoint dirs (regression: video
    placeholder handling in _prep)."""
    from x2i_tpu.cli import main
    _, (flux, mllm, proj, model) = family_pipeline("qwenvl")
    vid = str(tmp_path / "vid.gif")
    frames = [_img(30 + i, size=16) for i in range(3)]
    frames[0].save(vid, save_all=True, append_images=frames[1:],
                   duration=1000, loop=0)
    out = str(tmp_path / "out.png")
    rc = main(["--task", "video2image", "--video", vid,
               "--flux_path", flux, "--mllm_path", mllm,
               "--proj_path", proj, "--model", model,
               "--num_steps", "2", "--height", "64", "--width", "64",
               "--output", out])
    assert rc in (0, None)
    assert os.path.exists(out)


def test_convert_cli_from_dirs(family_pipeline, tmp_path):
    """x2i-convert over the fixture dirs: every artifact kind converts
    (architecture from the dir's own config files) and loads back via
    load_native with matching leaf count."""
    import jax
    from x2i_tpu.convert.cli import load_native, main
    _, (flux, mllm, proj, model) = family_pipeline("qwenvl")
    for kind, src in (("flux", flux), ("vae", flux), ("mllm", mllm),
                      ("proj", proj)):
        dst = str(tmp_path / kind)
        rc = main([kind, "--src", src, "--dst", dst, "--model", model])
        assert rc == 0
        tree = load_native(dst)
        assert len(jax.tree_util.tree_leaves(tree)) > 3


def test_multiturn_session_from_checkpoint_dirs(family_pipeline):
    """build_session_from_checkpoints over the fixture dirs: two real
    turns (chat template + greedy decode with hidden export + proj +
    generate), history accumulates, images decode."""
    from x2i_tpu.multiturn import build_session_from_checkpoints
    _, (flux, mllm, proj, model) = family_pipeline("qwenvl")
    sess = build_session_from_checkpoints(
        model=model, flux_path=flux, mllm_path=mllm, proj_path=proj,
        num_steps=2, height=64, width=64, max_new_tokens=4)
    a1, img1 = sess.turn("draw a cat")
    a2, img2 = sess.turn("make it orange")
    assert isinstance(a1, str) and isinstance(a2, str)
    assert len(sess.history) == 2
    assert sess.history[0].user == "draw a cat"
    assert np.asarray(img1).shape == (1, 64, 64, 3)
    assert np.asarray(img2).shape == (1, 64, 64, 3)


def test_proj_config_inferred_from_sd(tmp_path):
    """proj_config_from_sd recovers the architecture from shapes alone,
    for both the cnn and cha_scale variants (utils/proj.py:35-53)."""
    import torch
    from x2i_tpu.convert.hf_config import proj_config_from_sd
    p1 = build_proj_bin(str(tmp_path), in_channels=5, input_dim=48,
                        output_dim0=32, output_dim1=64, kernel_size=3)
    cfg = proj_config_from_sd(torch.load(p1, weights_only=True))
    assert (cfg.in_channels, cfg.kernel_size, cfg.input_dim,
            cfg.output_dim0, cfg.output_dim1) == (5, 3, 48, 32, 64)
    assert cfg.use_cnn and not cfg.use_scale and not cfg.use_t5
    os.remove(p1)
    p2 = build_proj_bin(str(tmp_path), in_channels=7, input_dim=24,
                        use_cnn=False, use_scale=True)
    cfg2 = proj_config_from_sd(torch.load(p2, weights_only=True))
    assert cfg2.in_channels == 7 and cfg2.use_scale and not cfg2.use_cnn


def test_flux_dir_config_parsing(tmp_path):
    """flux/vae/scheduler configs come from the directory's own json."""
    from x2i_tpu.convert.hf_config import (flux_config_from_dir,
                                           scheduler_config_from_dir,
                                           vae_config_from_dir)
    flux = build_flux_dir(str(tmp_path))
    fc = flux_config_from_dir(flux)
    assert (fc.num_layers, fc.num_single_layers, fc.attention_head_dim,
            fc.num_attention_heads) == (1, 2, 16, 4)
    assert fc.joint_attention_dim == 64 and fc.axes_dims_rope == (4, 6, 6)
    vc = vae_config_from_dir(flux)
    assert vc.latent_channels == 4
    assert vc.block_out_channels == (8, 8, 16, 16)
    sc = scheduler_config_from_dir(flux)
    assert sc.shift == 1.0 and not sc.use_dynamic_shifting
    assert flux_config_from_dir(str(tmp_path / "nope")) is None
