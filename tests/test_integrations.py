"""ComfyUI surface (conditioning format, proj checkpoint roundtrip) and
multi-turn session behavior."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from x2i_tpu.core.config import ProjConfig, tiny_qwen2_config
from x2i_tpu.integrations.comfyui import (MLLMEncode, ProjLoader,
                                          load_proj_checkpoint,
                                          save_proj_checkpoint)
from x2i_tpu.models.proj import Proj
from x2i_tpu.models.qwen2 import Qwen2LM
from x2i_tpu.multiturn import MultiTurnSession


def _tiny_proj():
    cfg = ProjConfig(in_channels=3, input_dim=16, output_dim0=8,
                     output_dim1=12, dtype=jnp.float32,
                     param_dtype=jnp.float32)
    proj = Proj(cfg)
    params = proj.init(jax.random.key(0), jnp.zeros((1, 3, 4, 16)))
    return cfg, proj, params


def test_proj_checkpoint_roundtrip(tmp_path):
    import dataclasses
    cfg, proj, params = _tiny_proj()
    path = str(tmp_path / "proj.npz")
    cfg_dict = {k: v for k, v in dataclasses.asdict(cfg).items()
                if k not in ("dtype", "param_dtype")}
    save_proj_checkpoint(path, cfg_dict, params["params"])
    loader = ProjLoader()
    ((proj2, params2),) = loader.load(path)
    x = jnp.ones((1, 3, 4, 16))
    a = proj.apply(params, x)
    # loaded cfg uses default (bf16) dtypes; compare loosely
    b = proj2.apply(params2, x)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1], np.float32),
                               atol=0.05)


@pytest.mark.slow
def test_mllm_encode_conditioning_format():
    cfg, proj, params = _tiny_proj()

    def encoder_fn(inputs):
        return jnp.ones((1, 3, 4, 16))

    node = MLLMEncode()
    (conditioning,) = node.encode(encoder_fn, (proj, params), "a cat")
    assert isinstance(conditioning, list)
    embeds, extras = conditioning[0]
    assert embeds.shape == (1, 4, 12)
    assert extras["pooled_output"].shape == (1, 8)


@pytest.mark.slow
def test_multiturn_session():
    lm_cfg = tiny_qwen2_config()
    lm = Qwen2LM(lm_cfg)
    lm_params = lm.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    pcfg = ProjConfig(in_channels=lm_cfg.num_layers_with_embedding,
                      input_dim=lm_cfg.hidden_size, output_dim0=8,
                      output_dim1=12, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    proj = Proj(pcfg)
    proj_params = proj.init(jax.random.key(1), jnp.zeros((1, 3, 4, 64)))

    def tokenize(history, user_msg):
        toks = []
        for t in history:
            toks += [hash(c) % 500 for c in t.user + t.assistant]
        toks += [hash(c) % 500 for c in user_msg]
        ids = np.asarray([toks[-16:] or [1]], np.int32)
        return ids, np.ones_like(ids, bool)

    images = []

    def generate_image(pooled, prompt_embeds, seed):
        images.append((np.asarray(pooled), seed))
        return np.zeros((1, 8, 8, 3), np.uint8)

    sess = MultiTurnSession(lm, lm_params, tokenize,
                            lambda ids: f"<{len(ids)} toks>", proj.apply,
                            proj_params, generate_image, eos_token_id=-1,
                            max_new_tokens=4, seed=0)
    ans1, img1 = sess.turn("draw a cat")
    assert len(sess.history) == 1 and sess.history[0].user == "draw a cat"
    ans2, img2 = sess.turn("make it red")
    assert len(sess.history) == 2
    assert images[0][1] == 0 and images[1][1] == 0   # fixed seed each turn
    assert img1.shape == (1, 8, 8, 3)
    sess.reset()
    assert not sess.history


@pytest.mark.slow
def test_proj_with_t5_refiner(rng):
    """use_t5=True wires the T5EncoderStack refiner (utils/proj.py:41-46)."""
    cfg = ProjConfig(in_channels=3, input_dim=16, output_dim0=8,
                     output_dim1=12, num_layers=1, num_heads=2, head_dim=8,
                     use_t5=True, use_scale=False, use_cnn=True,
                     dtype=jnp.float32, param_dtype=jnp.float32)
    proj = Proj(cfg)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 16)), jnp.float32)
    params = proj.init(jax.random.key(0), x)
    assert "t5stack" in params["params"]
    pooled, seq = proj.apply(params, x)
    assert pooled.shape == (2, 8) and seq.shape == (2, 4, 12)
    assert np.isfinite(np.asarray(seq)).all()


def test_inference_prompt_semantics():
    """Inference prompts: InternVL wraps in the 2-key dict with constant
    'no'; MiniCPM/Qwen pass the raw prompt (reference infer scripts)."""
    from x2i_tpu.models.templates import (minicpm_omni_content,
                                          qwen_chat_messages,
                                          task_instruction)
    assert task_instruction("imagetext2image", "Add a car") == (
        "{'Text input': 'Add a car', "
        "'Instruction editing description': 'no'}")
    msgs = qwen_chat_messages("imagetext2image", "Add a car", num_images=1)
    assert msgs[0]["content"][-1] == {"type": "text", "text": "Add a car"}
    content = minicpm_omni_content("Add a car", num_images=2, num_audios=1)
    assert content == ("(<image>./</image>)\n" * 2
                       + "(<audio>./</audio>)\n" + "Add a car")


def test_comfyui_plugin_shim_loads_like_comfyui(tmp_path):
    """ComfyUI imports custom_nodes/<pkg>/__init__.py and reads
    NODE_CLASS_MAPPINGS; simulate that exact load from a fresh module
    name with no package context."""
    import importlib.util
    import os

    shim = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "comfyui_x2i_tpu", "__init__.py")
    spec = importlib.util.spec_from_file_location(
        "custom_nodes.comfyui_x2i_tpu", shim)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    assert set(mod.NODE_CLASS_MAPPINGS) == set(
        mod.NODE_DISPLAY_NAME_MAPPINGS)
    assert "X2I_MLLMEncode" in mod.NODE_CLASS_MAPPINGS
    for cls in mod.NODE_CLASS_MAPPINGS.values():
        # the ComfyUI node protocol surface
        assert callable(cls.INPUT_TYPES)
        assert isinstance(cls.RETURN_TYPES, tuple)
        assert hasattr(cls, cls.FUNCTION)
