"""Golden test: Proj matches a torch mirror of the reference Proj7Exp
(utils/proj.py:14-96) with identical weights."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from x2i_tpu.core.config import ProjConfig
from x2i_tpu.models.proj import Proj


class TorchMLP3(nn.Module):
    """Mirror of reference MLP3 (utils/proj.py:14-33)."""

    def __init__(self, in_dim, out_dim, hidden_dim, out_dim1, eps):
        super().__init__()
        self.layernorm = nn.LayerNorm(in_dim, eps=eps)
        self.projector = nn.Sequential(
            nn.Linear(in_dim, hidden_dim, bias=False), nn.GELU(),
            nn.Linear(hidden_dim, hidden_dim, bias=False))
        self.fc = nn.Sequential(nn.GELU(), nn.Linear(out_dim, out_dim1))

    def forward(self, x):
        x = self.layernorm(x)
        x2 = self.projector(x)
        x1 = self.fc(x2).mean(1)
        return x1, x2


class TorchProj(nn.Module):
    """Mirror of reference Proj7Exp (use_t5=False paths)."""

    def __init__(self, c, k, in_dim, out0, out1, eps, use_scale, use_cnn):
        super().__init__()
        self.use_scale, self.use_cnn = use_scale, use_cnn
        if use_scale:
            self.cha_scale = nn.Parameter(torch.randn(1, c, 1, 1))
        elif use_cnn:
            self.conv = nn.Conv2d(c, 1, kernel_size=k, padding=(k - 1) // 2)
        self.mlp = TorchMLP3(in_dim, out1, out1, out0, eps)

    def forward(self, x):
        b, c, s, h = x.shape
        if self.use_scale:
            x = (self.cha_scale * x).mean(dim=1)
        elif self.use_cnn:
            x = self.conv(x).squeeze(1)
        else:
            x = x.mean(dim=1)
        return self.mlp(x)


def _cfg(use_scale, use_cnn):
    return ProjConfig(in_channels=4, kernel_size=5, input_dim=16,
                      output_dim0=12, output_dim1=32, use_t5=False,
                      use_scale=use_scale, use_cnn=use_cnn,
                      dtype=jnp.float32, param_dtype=jnp.float32)


def _params_from_torch(tm, cfg):
    p = {}
    if cfg.use_scale:
        p["cha_scale"] = tm.cha_scale.detach().numpy()
    elif cfg.use_cnn:
        # torch (out=1, in=C, kh, kw) -> flax (kh, kw, in, out)
        p["conv"] = {
            "kernel": tm.conv.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": tm.conv.bias.detach().numpy()}
    p["ln_scale"] = tm.mlp.layernorm.weight.detach().numpy()
    p["ln_bias"] = tm.mlp.layernorm.bias.detach().numpy()
    p["proj_in"] = {"kernel": tm.mlp.projector[0].weight.detach().numpy().T}
    p["proj_out"] = {"kernel": tm.mlp.projector[2].weight.detach().numpy().T}
    p["pooled_out"] = {"kernel": tm.mlp.fc[1].weight.detach().numpy().T,
                       "bias": tm.mlp.fc[1].bias.detach().numpy()}
    return {"params": p}


import pytest


@pytest.mark.parametrize("use_scale,use_cnn",
                         [(False, True), (True, False), (False, False)])
def test_proj_matches_torch_reference(rng, use_scale, use_cnn):
    torch.manual_seed(0)
    cfg = _cfg(use_scale, use_cnn)
    tm = TorchProj(cfg.in_channels, cfg.kernel_size, cfg.input_dim,
                   cfg.output_dim0, cfg.output_dim1, cfg.norm_eps,
                   use_scale, use_cnn)
    x = rng.standard_normal(
        (2, cfg.in_channels, 8, cfg.input_dim)).astype(np.float32)
    want_pooled, want_seq = tm(torch.tensor(x))

    params = _params_from_torch(tm, cfg)
    pooled, seq = Proj(cfg).apply(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(seq),
                               want_seq.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               want_pooled.detach().numpy(), atol=2e-5)
