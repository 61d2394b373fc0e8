"""Phase-1 distillation: KD loss golden vs torch, end-to-end step on tiny
models, and the sharded multi-device path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from jax.sharding import NamedSharding, PartitionSpec as P

from x2i_tpu.core.config import (DistillConfig, MeshConfig, ProjConfig,
                                 tiny_flux_config, tiny_qwen2_config)
from x2i_tpu.core.mesh import make_mesh
from x2i_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
from x2i_tpu.models.flux import FluxTransformer2D
from x2i_tpu.models.proj import Proj
from x2i_tpu.models.qwen2 import Qwen2LM
from x2i_tpu.models.t5 import T5Config, T5Encoder
from x2i_tpu.train.distill import (TrainState, kd_loss, make_distill_step,
                                   make_optimizer, normalize_logit)


def _torch_kd(t, s, tau=3.0):
    def norm(x):
        return (x - x.mean(-1, keepdim=True)) / (1e-7 + x.std(-1, keepdim=True))
    loss = 0.0
    for i in range(t.shape[1]):
        loss += F.kl_div(F.softmax(norm(t[:, i]) / tau, -1).log(),
                         F.softmax(norm(s[:, i]) / tau, -1),
                         reduction="batchmean")
    return loss


def test_kd_loss_matches_torch(rng):
    B, L, S, D = 2, 3, 8, 16
    stacks = {}
    tstacks = {}
    for key in ("double_img", "double_txt", "single"):
        t = rng.standard_normal((B, L, S, D)).astype(np.float32)
        s = rng.standard_normal((B, L, S, D)).astype(np.float32)
        stacks[key] = (jnp.asarray(t), jnp.asarray(s))
        tstacks[key] = (torch.tensor(t), torch.tensor(s))
    got = kd_loss({k: v[0] for k, v in stacks.items()},
                  {k: v[1] for k, v in stacks.items()})
    want = sum(_torch_kd(t, s) for t, s in tstacks.values())
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_kd_loss_zero_when_identical(rng):
    aux = {k: jnp.asarray(rng.standard_normal((1, 2, 8, 16)), jnp.float32)
           for k in ("double_img", "double_txt", "single")}
    assert abs(float(kd_loss(aux, aux))) < 1e-5


def test_normalize_matches_torch(rng):
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    got = np.asarray(normalize_logit(jnp.asarray(x)))
    xt = torch.tensor(x)
    want = ((xt - xt.mean(-1, keepdim=True))
            / (1e-7 + xt.std(-1, keepdim=True))).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


from x2i_tpu.train.harness import build_tiny_distill as _build_tiny_trainer


@pytest.mark.slow
def test_distill_step_runs_and_learns():
    step_fn, state, flux_params, batch = _build_tiny_trainer()
    jstep = jax.jit(step_fn)
    losses = []
    for i in range(6):
        state, metrics = jstep(state, flux_params, batch, jax.random.key(1))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert float(metrics["grad_norm"]) > 0


@pytest.mark.slow
def test_distill_step_sharded_multidevice():
    """Same step under a (data, fsdp, tensor) mesh with batch sharded over
    all 8 virtual devices."""
    mesh = make_mesh(MeshConfig(data=4, fsdp=2, tensor=1))
    step_fn, state, flux_params, batch = _build_tiny_trainer()
    batch_sharding = NamedSharding(mesh, P(("data", "fsdp")))
    repl = NamedSharding(mesh, P())
    batch = {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}
    state = jax.device_put(state, repl)
    flux_params = jax.device_put(flux_params, repl)

    jstep = jax.jit(step_fn)
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        state2, metrics = jstep(state, flux_params, batch, jax.random.key(1))
        # second step: past LR warmup (first step lr == 0)
        state2, metrics = jstep(state2, flux_params, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    # params updated
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        state2.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


@pytest.mark.slow
def test_distill_with_8bit_adam():
    """use_8bit_adam flag: distillation trains with fp8-moment optimizer
    (reference launchers default to bnb AdamW8bit)."""
    import jax.numpy as jnp
    from x2i_tpu.train.distill import make_optimizer
    dcfg = DistillConfig(use_8bit_adam=True, lr_warmup_steps=1,
                         max_train_steps=100, learning_rate=1e-3)
    opt = make_optimizer(dcfg)
    params = {"w": jnp.zeros((300,))}
    state = opt.init(params)
    # fp8 moments present inside the chained/multi-step state
    leaves = jax.tree_util.tree_leaves(
        state, is_leaf=lambda x: hasattr(x, "dtype"))
    assert any(getattr(l, "dtype", None) == jnp.float8_e4m3fn
               for l in leaves)
    g = {"w": jnp.ones((300,))}
    updates, _ = opt.update(g, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


@pytest.mark.slow
def test_inline_kd_matches_two_pass(rng):
    """The inline per-block KD path (scalars leave the scan) computes the
    same loss as the materialized two-pass kd_loss."""
    from x2i_tpu.diffusion.sampling import prepare_latent_image_ids
    from x2i_tpu.models.flux import FluxTransformer2D

    cfg = tiny_flux_config()
    B, GRID, S_TXT = 2, 8, 8
    s_img = (GRID // 2) ** 2
    hidden = jnp.asarray(rng.standard_normal((B, s_img, cfg.in_channels)),
                         jnp.float32)
    encoder = jnp.asarray(
        rng.standard_normal((B, S_TXT, cfg.joint_attention_dim)),
        jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((B, cfg.pooled_projection_dim)), jnp.float32)
    t = jnp.full((B,), 1.0)
    img_ids = prepare_latent_image_ids(GRID, GRID)
    txt_ids = jnp.zeros((S_TXT, 3))

    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)
    # teacher aux = a perturbed run
    _, teacher_aux = model.apply(params, hidden, encoder * 1.1, pooled, t,
                                 img_ids, txt_ids,
                                 return_attn_outputs=True)
    _, student_aux = model.apply(params, hidden, encoder, pooled, t,
                                 img_ids, txt_ids,
                                 return_attn_outputs=True)
    want = kd_loss(teacher_aux, student_aux, 3.0)

    _, got = model.apply(params, hidden, encoder, pooled, t, img_ids,
                         txt_ids, kd_targets=teacher_aux,
                         kd_temperature=3.0)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-3)


@pytest.mark.slow
def test_inline_kd_distill_step(rng):
    """End-to-end distill step with inline_kd=True: loss matches the
    default path and still decreases."""
    from x2i_tpu.train.harness import build_tiny_distill
    import dataclasses
    step_fn, state, flux_params, batch = _build_tiny_trainer(batch_size=4)
    # rebuild with inline kd via harness is not parameterized; compare the
    # first-step losses of both paths by patching dcfg through a fresh
    # harness copy
    import x2i_tpu.train.harness as H
    import x2i_tpu.core.config as C
    orig = C.DistillConfig
    _, m_ref = jax.jit(step_fn)(state, flux_params, batch,
                                jax.random.key(3))

    class PatchedCfg(orig):
        def __new__(cls, *a, **kw):
            kw["inline_kd"] = True
            return orig(*a, **kw)

    H.DistillConfig = PatchedCfg
    try:
        step2, state2, flux2, batch2 = H.build_tiny_distill(batch_size=4)
    finally:
        H.DistillConfig = orig
    _, m_inline = jax.jit(step2)(state2, flux2, batch2, jax.random.key(3))
    np.testing.assert_allclose(float(m_inline["loss"]),
                               float(m_ref["loss"]), rtol=1e-4)


@pytest.mark.slow
def test_int8_kd_stacks_close_to_dense(rng):
    """Per-token int8 teacher stacks give the same KD loss to ~1% (both
    through the two-pass kd_loss and the inline scan path)."""
    from x2i_tpu.diffusion.sampling import prepare_latent_image_ids
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.ops.kd import dequantize_kd, quantize_kd_stacks

    cfg = tiny_flux_config()
    B, GRID, S_TXT = 2, 8, 8
    s_img = (GRID // 2) ** 2
    hidden = jnp.asarray(rng.standard_normal((B, s_img, cfg.in_channels)),
                         jnp.float32)
    encoder = jnp.asarray(
        rng.standard_normal((B, S_TXT, cfg.joint_attention_dim)),
        jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((B, cfg.pooled_projection_dim)), jnp.float32)
    t = jnp.full((B,), 1.0)
    img_ids = prepare_latent_image_ids(GRID, GRID)
    txt_ids = jnp.zeros((S_TXT, 3))

    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)
    _, teacher_aux = model.apply(params, hidden, encoder * 1.1, pooled, t,
                                 img_ids, txt_ids,
                                 return_attn_outputs=True)
    _, student_aux = model.apply(params, hidden, encoder, pooled, t,
                                 img_ids, txt_ids,
                                 return_attn_outputs=True)
    qaux = quantize_kd_stacks(teacher_aux)
    # round-trip sanity
    rt = dequantize_kd(qaux["single"])
    rel = float(jnp.max(jnp.abs(rt - teacher_aux["single"]))
                / jnp.max(jnp.abs(teacher_aux["single"])))
    assert rel < 0.01, rel

    want = kd_loss(teacher_aux, student_aux, 3.0)
    got_twopass = kd_loss(qaux, student_aux, 3.0)
    # the tiny-model loss is ~4e-3, so quant noise shows up as a small
    # absolute offset in the target distribution
    np.testing.assert_allclose(float(got_twopass), float(want), atol=1e-3)

    _, got_inline = model.apply(params, hidden, encoder, pooled, t, img_ids,
                                txt_ids, kd_targets=qaux,
                                kd_temperature=3.0)
    np.testing.assert_allclose(float(got_inline), float(got_twopass),
                               rtol=2e-3)

    # in-scan quantization (bf16 stacks never materialize) == post-hoc
    _, qaux_scan = model.apply(params, hidden, encoder * 1.1, pooled, t,
                               img_ids, txt_ids, return_attn_outputs=True,
                               quantize_attn_outputs=True)
    for key in qaux:
        np.testing.assert_array_equal(np.asarray(qaux_scan[key][0]),
                                      np.asarray(qaux[key][0]))
        np.testing.assert_allclose(np.asarray(qaux_scan[key][1]),
                                   np.asarray(qaux[key][1]), rtol=1e-6)


@pytest.mark.slow
def test_regenerated_latents_match_shipped(rng):
    """slim_handoff split topology (teacher ships ONLY the KD stacks; the
    student regenerates the seeded latents from the shared rng and reads
    MLLM states from the batch) reproduces the default split loss
    bit-for-bit."""
    from x2i_tpu.train.harness import build_tiny_distill

    key = jax.random.key(7)
    (t_fn, s_fn), state, fp, batch = build_tiny_distill(
        batch_size=2, split=True)
    t_out = jax.jit(t_fn)(fp, batch, key)
    _, m_ref = jax.jit(s_fn)(state, fp, batch, t_out, key)

    (t2, s2), state2, fp2, batch2 = build_tiny_distill(
        batch_size=2, split=True, slim_handoff=True)
    t_out2 = jax.jit(t2)(fp2, batch2, key)
    assert set(t_out2) == {"teacher_aux"}          # slim hand-off
    _, m_slim = jax.jit(s2)(state2, fp2, batch2, t_out2, key)
    np.testing.assert_allclose(float(m_slim["loss"]),
                               float(m_ref["loss"]), rtol=1e-6)


@pytest.mark.slow
def test_single_chip_split_compiler(rng):
    """compile_single_chip_distill (AOT teacher/student executables with a
    layout-pinned hand-off) reproduces the colocated-step loss on tiny
    configs."""
    from x2i_tpu.train.harness import build_tiny_distill
    from x2i_tpu.train.single_chip import compile_single_chip_distill

    key = jax.random.key(11)
    step_fn, state, fp, batch = build_tiny_distill(batch_size=2)
    parts = build_tiny_distill.last_parts
    _, m_ref = jax.jit(step_fn)(state, fp, batch, key)

    run_step, jteacher, jstudent = compile_single_chip_distill(
        parts["flux_apply"], parts["proj_apply"],
        parts["teacher_text_fn"], parts["student_states_fn"],
        parts["optimizer"], parts["flux_cfg"], parts["dcfg"],
        state, fp, batch, key, donate_state=False)
    state2, m_split = run_step(state, fp, batch, key)
    np.testing.assert_allclose(float(m_split["loss"]),
                               float(m_ref["loss"]), rtol=1e-5)
    # a second step consumes the first step's state carry (layout path)
    _, m2 = run_step(state2, fp, batch, key)
    assert np.isfinite(float(m2["loss"]))
