"""Run the actual reference Proj7Exp (imported read-only from
/root/reference) and check our Proj + checkpoint converter reproduce it
bit-for-bit (f32). This validates proj_params_from_reference against the
real checkpoint format, not a mirror."""

import importlib.util
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from x2i_tpu.convert.torch_models import proj_params_from_reference
from x2i_tpu.core.config import ProjConfig
from x2i_tpu.models.proj import Proj

REF = "/root/reference/utils/proj.py"


@pytest.fixture(scope="module")
def ref_proj_module():
    spec = importlib.util.spec_from_file_location("ref_proj", REF)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as exn:              # noqa: BLE001
        pytest.skip(f"reference proj not importable: {exn!r}")
    return mod


@pytest.mark.parametrize("use_scale,use_cnn",
                         [(False, True), (True, False)])
def test_reference_proj_checkpoint_parity(ref_proj_module, rng, use_scale,
                                          use_cnn):
    torch.manual_seed(0)
    ref = ref_proj_module.Proj7Exp(
        in_channels=4, kernel_size=5, input_dim=16, output_dim0=12,
        output_dim1=32, norm_eps=1e-6, use_t5=False, use_scale=use_scale,
        use_cnn=use_cnn).eval().float()
    # simulate the shipped checkpoint format incl. DDP prefix
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}

    cfg = ProjConfig(in_channels=4, kernel_size=5, input_dim=16,
                     output_dim0=12, output_dim1=32, use_t5=False,
                     use_scale=use_scale, use_cnn=use_cnn,
                     dtype=jnp.float32, param_dtype=jnp.float32)
    params = {"params": proj_params_from_reference(sd, cfg)}

    x = rng.standard_normal((2, 4, 8, 16)).astype(np.float32)
    with torch.no_grad():
        want_pooled, want_seq = ref(torch.tensor(x))
    pooled, seq = Proj(cfg).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(seq), want_seq.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), want_pooled.numpy(),
                               atol=2e-5)
