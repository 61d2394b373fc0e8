"""Eval subsystem: CLIP vision golden vs HF, CLIP-T scorer end to end,
Fréchet distance sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from x2i_tpu.convert.torch_models import (clip_params_from_hf,
                                          clip_vision_params_from_hf)
from x2i_tpu.evalmetrics import (CLIPScorer, frechet_distance,
                                 preprocess_clip_images)
from x2i_tpu.models.clip import (CLIPTextConfig, CLIPTextEncoder,
                                 CLIPVisionConfig, CLIPVisionEncoder)


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import CLIPConfig, CLIPModel
    torch.manual_seed(0)
    cfg = CLIPConfig(
        text_config=dict(vocab_size=100, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4,
                         max_position_embeddings=24, eos_token_id=99,
                         bos_token_id=98, hidden_act="quick_gelu"),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=28, patch_size=7,
                           hidden_act="quick_gelu"),
        projection_dim=16)
    cfg._attn_implementation = "eager"
    return CLIPModel(cfg).eval().float()


def _vision_cfg():
    return CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            image_size=28, patch_size=7, projection_dim=16,
                            dtype=jnp.float32, param_dtype=jnp.float32)


def test_clip_vision_matches_hf(hf_clip, rng):
    px = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf_clip.vision_model(
            torch.tensor(px.transpose(0, 3, 1, 2))).pooler_output.numpy()
    params = {"params": clip_vision_params_from_hf(
        hf_clip.state_dict(), 2, prefix="vision_model.")}
    _, pooled = CLIPVisionEncoder(_vision_cfg()).apply(params,
                                                       jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(pooled), want, atol=3e-5)


def test_clip_scorer_matches_hf_logits(hf_clip, rng):
    """Full CLIP-T score vs HF CLIPModel logits_per_image / logit_scale."""
    imgs = (rng.random((2, 40, 40, 3)) * 255).astype(np.uint8)
    ids = rng.integers(0, 97, (2, 10))
    ids[:, -1] = 99

    px = preprocess_clip_images(imgs, size=28)
    with torch.no_grad():
        out = hf_clip(input_ids=torch.tensor(ids),
                      pixel_values=torch.tensor(px.transpose(0, 3, 1, 2)))
        scale = float(hf_clip.logit_scale.exp())
        want = (out.logits_per_image.diagonal() / scale * 100).numpy()

    sd = hf_clip.state_dict()
    text_cfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                              intermediate_size=64, num_hidden_layers=2,
                              num_attention_heads=4,
                              max_position_embeddings=24, eos_token_id=99,
                              dtype=jnp.float32, param_dtype=jnp.float32)
    tok_table = {i: ids[i] for i in range(2)}
    scorer = CLIPScorer(
        text_model=CLIPTextEncoder(text_cfg),
        text_params={"params": clip_params_from_hf(sd, 2)},
        vision_model=CLIPVisionEncoder(_vision_cfg()),
        vision_params={"params": clip_vision_params_from_hf(
            sd, 2, prefix="vision_model.")},
        text_projection=jnp.asarray(
            sd["text_projection.weight"].numpy().T),
        visual_projection=jnp.asarray(
            sd["visual_projection.weight"].numpy().T),
        tokenize=lambda t: tok_table[int(t)])
    got = scorer.clip_t(imgs, ["0", "1"])
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_frechet_distance_properties(rng):
    a = rng.standard_normal((200, 8)).astype(np.float64)
    b = rng.standard_normal((200, 8)).astype(np.float64) + 3.0
    same = frechet_distance(a, a.copy())
    far = frechet_distance(a, b)
    assert abs(same) < 1e-6
    assert far > 50.0


def test_build_clip_scorer_from_checkpoint_dir(hf_clip, rng, tmp_path):
    """build_clip_scorer glue: save a tiny HF CLIPModel + tokenizer to
    disk, load through the one-call builder, match HF logits end to end."""
    import json

    from transformers import CLIPTokenizer

    from x2i_tpu.evalmetrics import build_clip_scorer

    path = str(tmp_path / "clip")
    hf_clip.save_pretrained(path)
    # tiny BPE files consistent with the model's vocab_size=100 / eos=99
    vocab = {"<|startoftext|>": 98, "<|endoftext|>": 99}
    nid = 0
    for t in ([c for c in "abcdefghijklmnopqrstuvwxyz"]
              + [c + "</w>" for c in "abcdefghijklmnopqrstuvwxyz"]
              + ["ca", "cat</w>"]):
        vocab[t] = nid
        nid += 1
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(tmp_path / "merges.txt", "w") as f:
        f.write("#version: 0.2\nc a\nca t</w>\n")
    CLIPTokenizer(str(tmp_path / "vocab.json"),
                  str(tmp_path / "merges.txt")).save_pretrained(path)

    scorer = build_clip_scorer(path)
    assert scorer.text_model.cfg.eos_token_id == 99
    assert scorer.vision_model.cfg.image_size == 28

    texts = ["a cat", "cab"]
    imgs = (rng.random((2, 40, 40, 3)) * 255).astype(np.uint8)
    px = preprocess_clip_images(imgs, size=28)
    ids = np.stack([scorer.tokenize(t) for t in texts])
    with torch.no_grad():
        out = hf_clip(input_ids=torch.tensor(np.asarray(ids, np.int64)),
                      pixel_values=torch.tensor(px.transpose(0, 3, 1, 2)))
        scale = float(hf_clip.logit_scale.exp())
        want = (out.logits_per_image.diagonal() / scale * 100).numpy()
    got = scorer.clip_t(imgs, texts)
    np.testing.assert_allclose(got, want, atol=1e-3)
