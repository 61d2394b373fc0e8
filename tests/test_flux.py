"""FLUX DiT structural tests on a tiny config (shapes, aux KD stacks,
control injection, guidance variant, jit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2i_tpu.core.config import tiny_flux_config
from x2i_tpu.diffusion.sampling import prepare_latent_image_ids
from x2i_tpu.models.flux import FluxTransformer2D, timestep_embedding


B, S_TXT, GRID = 2, 8, 8           # latent grid 8x8 -> 16 packed tokens
S_IMG = (GRID // 2) * (GRID // 2)


def _inputs(rng):
    cfg = tiny_flux_config()
    hidden = jnp.asarray(
        rng.standard_normal((B, S_IMG, cfg.in_channels)), jnp.float32)
    encoder = jnp.asarray(
        rng.standard_normal((B, S_TXT, cfg.joint_attention_dim)), jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((B, cfg.pooled_projection_dim)), jnp.float32)
    t = jnp.full((B,), 0.5, jnp.float32)
    img_ids = prepare_latent_image_ids(GRID, GRID)
    txt_ids = jnp.zeros((S_TXT, 3), jnp.float32)
    return cfg, hidden, encoder, pooled, t, img_ids, txt_ids


@pytest.mark.slow
def test_forward_shapes_and_aux(rng):
    cfg, hidden, encoder, pooled, t, img_ids, txt_ids = _inputs(rng)
    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)
    out, aux = model.apply(params, hidden, encoder, pooled, t, img_ids,
                           txt_ids, return_attn_outputs=True)
    assert out.shape == (B, S_IMG, cfg.in_channels)
    # KD stack layout (B, L, S, D) per train_minicpm.py:335-337
    assert aux["double_img"].shape == (B, cfg.num_layers, S_IMG, cfg.inner_dim)
    assert aux["double_txt"].shape == (B, cfg.num_layers, S_TXT, cfg.inner_dim)
    assert aux["single"].shape == (
        B, cfg.num_single_layers, S_TXT + S_IMG, cfg.inner_dim)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_scanned_params_are_stacked(rng):
    cfg, hidden, encoder, pooled, t, img_ids, txt_ids = _inputs(rng)
    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)
    db = params["params"]["double_blocks"]
    assert db["img_q"]["kernel"].shape[0] == cfg.num_layers
    sb = params["params"]["single_blocks"]
    assert sb["q"]["kernel"].shape[0] == cfg.num_single_layers


@pytest.mark.slow
def test_controls_injection_changes_output(rng):
    cfg, hidden, encoder, pooled, t, img_ids, txt_ids = _inputs(rng)
    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)
    base = model.apply(params, hidden, encoder, pooled, t, img_ids, txt_ids)
    controls = jnp.ones((cfg.num_layers, B, S_IMG, cfg.inner_dim),
                        jnp.float32) * 0.1
    ctl = model.apply(params, hidden, encoder, pooled, t, img_ids, txt_ids,
                      controls=controls)
    zero = model.apply(params, hidden, encoder, pooled, t, img_ids, txt_ids,
                       controls=jnp.zeros_like(controls))
    assert not np.allclose(np.asarray(base), np.asarray(ctl))
    np.testing.assert_allclose(np.asarray(base), np.asarray(zero), atol=1e-5)


@pytest.mark.slow
def test_guidance_variant(rng):
    cfg, hidden, encoder, pooled, t, img_ids, txt_ids = _inputs(rng)
    cfg = tiny_flux_config(guidance_embeds=True)
    model = FluxTransformer2D(cfg)
    g = jnp.full((B,), 3.5 / 1000 * 1000, jnp.float32) * 0 + 3.5
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids, guidance=g)
    o1 = model.apply(params, hidden, encoder, pooled, t, img_ids, txt_ids,
                     guidance=g)
    o2 = model.apply(params, hidden, encoder, pooled, t, img_ids, txt_ids,
                     guidance=g * 0.1)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


@pytest.mark.slow
def test_jit_and_grad(rng):
    cfg, hidden, encoder, pooled, t, img_ids, txt_ids = _inputs(rng)
    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)

    @jax.jit
    def fwd(p, h, e):
        return model.apply(p, h, e, pooled, t, img_ids, txt_ids)

    out = fwd(params, hidden, encoder)
    assert out.shape == (B, S_IMG, cfg.in_channels)

    # gradient w.r.t. the conditioning flows through all blocks (this is the
    # distillation path: proj output -> encoder_hidden_states).
    def loss(e):
        o, aux = model.apply(params, hidden, e, pooled, t, img_ids, txt_ids,
                             return_attn_outputs=True)
        return jnp.sum(aux["single"] ** 2) + jnp.sum(o ** 2)

    g = jax.grad(loss)(encoder)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_timestep_embedding_matches_diffusers_convention():
    # diffusers get_timestep_embedding(flip_sin_to_cos=True,
    # downscale_freq_shift=0) == [cos | sin]
    import torch, math
    t = np.array([0.0, 1.0, 500.0], np.float32)
    dim = 16
    got = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half).float() / half
    emb = torch.tensor(t)[:, None] * exponent.exp()[None]
    want = torch.cat([emb.cos(), emb.sin()], dim=-1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("flag", ["shard_activations", "shard_sequence",
                                  "ring_sequence"])
@pytest.mark.slow
def test_parallel_sharding_matches_unsharded(rng, flag):
    """TP/SP/ring sharding constraints change placement, not math."""
    from x2i_tpu.core.config import MeshConfig
    from x2i_tpu.core.mesh import make_mesh
    cfg = tiny_flux_config()
    scfg = tiny_flux_config(**{flag: True})
    B = 4
    hidden = jnp.asarray(
        rng.standard_normal((B, S_IMG, cfg.in_channels)), jnp.float32)
    encoder = jnp.asarray(
        rng.standard_normal((B, S_TXT, cfg.joint_attention_dim)),
        jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((B, cfg.pooled_projection_dim)), jnp.float32)
    t = jnp.full((B,), 0.5)
    img_ids = prepare_latent_image_ids(GRID, GRID)
    txt_ids = jnp.zeros((S_TXT, 3))

    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)
    want = model.apply(params, hidden, encoder, pooled, t, img_ids,
                       txt_ids)

    mesh = make_mesh(MeshConfig(data=4, fsdp=1, tensor=2),
                     devices=jax.devices()[:8])
    smodel = FluxTransformer2D(scfg)
    with jax.set_mesh(mesh):
        got = jax.jit(smodel.apply)(params, hidden, encoder, pooled, t,
                                    img_ids, txt_ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)


@pytest.mark.slow
def test_stack_remat_matches_block_remat(rng):
    """remat="stack" (remat around each whole scan) is numerically
    identical to block-level remat, forward and gradient."""
    cfg, hidden, encoder, pooled, t, img_ids, txt_ids = _inputs(rng)
    base = FluxTransformer2D(tiny_flux_config(remat=True))
    stack = FluxTransformer2D(tiny_flux_config(remat="stack"))
    params = base.init(jax.random.key(0), hidden, encoder, pooled, t,
                       img_ids, txt_ids)

    def loss(model, enc):
        out = model.apply(params, hidden, enc, pooled, t, img_ids, txt_ids)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    f_base = jax.jit(jax.value_and_grad(lambda e: loss(base, e)))
    f_stack = jax.jit(jax.value_and_grad(lambda e: loss(stack, e)))
    lb, gb = f_base(encoder)
    ls, gs = f_stack(encoder)
    np.testing.assert_allclose(float(ls), float(lb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gb), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.slow
def test_chunked_single_scan_matches_flat(rng):
    """single_scan_chunks=2 (sqrt-checkpointed singles) is numerically
    identical to the flat scan, forward and gradient, with params
    reshaped from the flat checkpoint layout."""
    from x2i_tpu.models.flux import chunk_single_scan_params
    cfg, hidden, encoder, pooled, t, img_ids, txt_ids = _inputs(rng)
    flat = FluxTransformer2D(tiny_flux_config(remat="stack"))
    chunked = FluxTransformer2D(tiny_flux_config(remat="stack",
                                                 single_scan_chunks=2))
    params = flat.init(jax.random.key(0), hidden, encoder, pooled, t,
                       img_ids, txt_ids)
    cparams = chunk_single_scan_params(params, 2)

    def loss(model, p, enc):
        out = model.apply(p, hidden, enc, pooled, t, img_ids, txt_ids)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    lb, gb = jax.jit(jax.value_and_grad(
        lambda e: loss(flat, params, e)))(encoder)
    ls, gs = jax.jit(jax.value_and_grad(
        lambda e: loss(chunked, cparams, e)))(encoder)
    np.testing.assert_allclose(float(ls), float(lb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gb), rtol=1e-5,
                               atol=1e-6)

    # chunked aux comes back as a per-chunk list; concat matches flat
    _, aux_f = flat.apply(params, hidden, encoder, pooled, t, img_ids,
                          txt_ids, return_attn_outputs=True)
    _, aux_c = chunked.apply(cparams, hidden, encoder, pooled, t, img_ids,
                             txt_ids, return_attn_outputs=True)
    assert isinstance(aux_c["single"], list) and len(aux_c["single"]) == 2
    np.testing.assert_allclose(
        np.concatenate([np.asarray(x) for x in aux_c["single"]], axis=1),
        np.asarray(aux_f["single"]), rtol=1e-6)

    # chunked-teacher aux (list form) feeds the chunked inline-KD student
    # copy-free, and matches the two-pass kd_loss
    from x2i_tpu.train.distill import kd_loss
    _, kl = chunked.apply(cparams, hidden, encoder * 1.1, pooled, t,
                          img_ids, txt_ids, kd_targets=aux_c,
                          kd_temperature=3.0)
    _, aux_s = chunked.apply(cparams, hidden, encoder * 1.1, pooled, t,
                             img_ids, txt_ids, return_attn_outputs=True)
    np.testing.assert_allclose(float(kl), float(kd_loss(aux_c, aux_s, 3.0)),
                               rtol=2e-3)


@pytest.mark.slow
def test_rope_layout_half_model_equivalence():
    """Full tiny-model equivalence: permute_params_to_half_rope + the
    rope_layout='half' forward reproduces the interleaved model."""
    from x2i_tpu.core.config import tiny_flux_config
    from x2i_tpu.diffusion.sampling import prepare_latent_image_ids
    from x2i_tpu.models.flux import (FluxTransformer2D,
                                     permute_params_to_half_rope)

    cfg_i = tiny_flux_config(rope_layout="interleaved")
    cfg_h = tiny_flux_config(rope_layout="half")
    m_i, m_h = FluxTransformer2D(cfg_i), FluxTransformer2D(cfg_h)
    grid, s_txt, b = 8, 8, 2
    s_img = (grid // 2) ** 2
    rng = np.random.default_rng(0)
    args = (jnp.asarray(rng.standard_normal((b, s_img, cfg_i.in_channels)),
                        jnp.float32),
            jnp.asarray(rng.standard_normal(
                (b, s_txt, cfg_i.joint_attention_dim)), jnp.float32),
            jnp.asarray(rng.standard_normal(
                (b, cfg_i.pooled_projection_dim)), jnp.float32),
            jnp.full((b,), 0.5), prepare_latent_image_ids(grid, grid),
            jnp.zeros((s_txt, 3)))
    params = m_i.init(jax.random.key(0), *args)
    out_i = m_i.apply(params, *args)
    out_h = m_h.apply(permute_params_to_half_rope(params, cfg_i), *args)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_i),
                               atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("stages", [2, 4])
def test_pipeline_parallel_matches_unsharded(rng, stages):
    """GPipe pipeline over the 'stage' mesh axis == plain forward; the
    4-stage case exercises the zero-padded masked-identity layers (2
    double blocks over 4 stages)."""
    from jax.sharding import Mesh

    from x2i_tpu.models.flux import flux_pipeline_forward

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_flux_config()
    model = FluxTransformer2D(cfg)
    B = 4
    args = (jnp.asarray(rng.standard_normal((B, S_IMG, cfg.in_channels)),
                        jnp.float32),
            jnp.asarray(rng.standard_normal(
                (B, S_TXT, cfg.joint_attention_dim)), jnp.float32),
            jnp.asarray(rng.standard_normal(
                (B, cfg.pooled_projection_dim)), jnp.float32),
            jnp.full((B,), 0.5), prepare_latent_image_ids(GRID, GRID),
            jnp.zeros((S_TXT, 3)))
    params = model.init(jax.random.key(0), *args)
    want = model.apply(params, *args)
    mesh = Mesh(np.array(jax.devices()).reshape(8 // stages, stages),
                ("data", "stage"))
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p, *a: flux_pipeline_forward(
            model, p, *a, n_stages=stages))(params, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


@pytest.mark.slow
def test_pipeline_parallel_grads(rng):
    """The pipeline's fori_loop has static bounds, so autodiff flows
    through the GPipe schedule: grads (activations AND stage-sharded
    param stacks) match the plain forward — pp training works."""
    from jax.sharding import Mesh

    from x2i_tpu.models.flux import flux_pipeline_forward

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_flux_config()
    model = FluxTransformer2D(cfg)
    B = 4
    args = (jnp.asarray(rng.standard_normal((B, S_IMG, cfg.in_channels)),
                        jnp.float32),
            jnp.asarray(rng.standard_normal(
                (B, S_TXT, cfg.joint_attention_dim)), jnp.float32),
            jnp.asarray(rng.standard_normal(
                (B, cfg.pooled_projection_dim)), jnp.float32),
            jnp.full((B,), 0.5), prepare_latent_image_ids(GRID, GRID),
            jnp.zeros((S_TXT, 3)))
    params = model.init(jax.random.key(0), *args)

    def loss_pp(enc):
        return jnp.sum(flux_pipeline_forward(
            model, params, args[0], enc, *args[2:], n_stages=2) ** 2)

    def loss_base(enc):
        return jnp.sum(model.apply(params, args[0], enc, *args[2:]) ** 2)

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "stage"))
    with jax.set_mesh(mesh):
        g_pp = jax.jit(jax.grad(loss_pp))(args[1])
    g_base = jax.grad(loss_base)(args[1])
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_base),
                               atol=5e-5)


@pytest.mark.parametrize("quant,chunks", [(None, 1), ("w8a8", 1),
                                          (None, 2)])
def test_precomputed_mods_match_per_step(rng, quant, chunks):
    """precompute-mods inference path: the per-step forward given
    mods_only=True outputs must equal the forward that computes its adaLN
    denses inline — exactly on w8a8 (per-row activation quantization sees
    the same temb rows either way), and with single_scan_chunks>1 (the
    per-chunk `single_blocks_{i}` scans must concatenate in layer order).
    Pins the +16 ms/image optimization in pipeline._generate_jit (mod
    weights read once, not once per step)."""
    import dataclasses

    cfg, hidden, encoder, pooled, t, img_ids, txt_ids = _inputs(rng)
    if quant:
        cfg = dataclasses.replace(cfg, quantized=quant)
    if chunks > 1:
        cfg = dataclasses.replace(cfg, single_scan_chunks=chunks)
    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)

    sigmas = jnp.asarray([1.0, 0.75, 0.5], jnp.float32)
    mods = model.apply(params, hidden, encoder, pooled, sigmas, img_ids,
                       txt_ids, mods_only=True)
    assert mods["double_img"].shape == (3, cfg.num_layers, B,
                                        6 * cfg.inner_dim)
    assert mods["single"].shape == (3, cfg.num_single_layers, B,
                                    3 * cfg.inner_dim)
    for i, sig in enumerate(np.asarray(sigmas)):
        ti = jnp.full((B,), sig, jnp.float32)
        ref = model.apply(params, hidden, encoder, pooled, ti, img_ids,
                          txt_ids)
        got = model.apply(params, hidden, encoder, pooled, ti, img_ids,
                          txt_ids,
                          precomputed_mods=jax.tree.map(lambda x: x[i],
                                                        mods))
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-5, rtol=2e-5)
