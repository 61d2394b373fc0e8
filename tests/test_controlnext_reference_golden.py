"""ControlNeXt numeric golden vs a diffusers-free torch transcription of
the reference module (/root/reference/lightcontrol/lightcontrol_flux.py:
575-749): conv stem, ResnetBlock2D+Downsample2D stages with timestep
embedding, residual mid convs, final k2-s2 projection to DiT tokens.

The mirror's state_dict() uses the reference's own key names and flows
through convert.load.controlnext_params_from_reference — the path a
train_lightcontrol.py checkpoint takes. Fast tier: tiny config, f32, CPU.
"""

import numpy as np
import torch

import jax.numpy as jnp

from x2i_tpu.core.config import ControlNeXtConfig
from x2i_tpu.convert.load import (controlnext_bank_params_from_reference,
                                  controlnext_params_from_reference)
from x2i_tpu.models.controlnext import ControlNeXt, apply_control_bank

from torch_mirrors import MirrorControlNeXt


def _tiny_cfg():
    return ControlNeXtConfig(in_channels=(128, 16), out_channels=(16, 16),
                             groups=(4, 4), time_embed_dim=16,
                             final_out_channels=32,
                             dtype=jnp.float32, param_dtype=jnp.float32)


def _mirror(cfg, seed=0):
    torch.manual_seed(seed)
    return MirrorControlNeXt(
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        groups=cfg.groups, time_embed_dim=cfg.time_embed_dim,
        final_out_channels=cfg.final_out_channels).eval()


def test_forward_matches_reference(rng):
    cfg = _tiny_cfg()
    mirror = _mirror(cfg)
    hint = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    t = np.asarray([250.0, 999.0], np.float32)
    with torch.no_grad():
        ref = mirror(torch.from_numpy(hint), torch.from_numpy(t))
    ref_tokens = ref["out"].flatten(2).transpose(1, 2).numpy()

    params = controlnext_params_from_reference(mirror.state_dict())
    out = ControlNeXt(cfg).apply(
        params, jnp.asarray(hint.transpose(0, 2, 3, 1)), jnp.asarray(t))
    assert out["scale"] == ref["scale"] == 1.0
    np.testing.assert_allclose(np.asarray(out["out"]), ref_tokens,
                               rtol=2e-4, atol=2e-5)


def test_bank_conversion_matches_per_branch(rng):
    """ModuleList-prefixed state dict (what train_lightcontrol.py:785-791
    saves) -> stacked bank params; each branch matches its torch net."""
    cfg = _tiny_cfg()
    n = 3
    nets = [_mirror(cfg, seed=5 + i) for i in range(n)]
    sd = {f"{i}.{k}": v for i, net in enumerate(nets)
          for k, v in net.state_dict().items()}
    bank = controlnext_bank_params_from_reference(sd, n)

    hint = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    t = np.asarray([500.0], np.float32)
    outs = apply_control_bank(cfg, bank,
                              jnp.asarray(hint.transpose(0, 2, 3, 1)),
                              jnp.asarray(t))
    for i, net in enumerate(nets):
        with torch.no_grad():
            ref = net(torch.from_numpy(hint), torch.from_numpy(t))
        ref_tokens = ref["out"].flatten(2).transpose(1, 2).numpy()
        np.testing.assert_allclose(np.asarray(outs[i]), ref_tokens,
                                   rtol=2e-4, atol=2e-5, err_msg=str(i))
