"""Disaggregated infer/train pools: teacher runs on its own device pool,
results ship to the train pool, training matches the colocated step."""

import itertools

import jax
import numpy as np
import pytest

from x2i_tpu.parallel.disaggregated import DisaggregatedDistill
from x2i_tpu.train.harness import build_tiny_distill

pytestmark = pytest.mark.slow


def test_disaggregated_pools_train():
    (teacher_fn, student_fn), state, flux_params, batch = \
        build_tiny_distill(batch_size=4, split=True)
    # 2 infer + 6 train devices, like the reference 8-GPU node topology
    dd = DisaggregatedDistill(teacher_fn, student_fn, flux_params,
                              flux_params, state, n_infer_devices=2)
    # pool membership
    assert len(dd.infer_mesh.devices.ravel()) == 2
    assert len(dd.train_mesh.devices.ravel()) == 6
    losses = []
    for i in range(3):
        tout = dd.teacher_step(batch, jax.random.key(1))
        # teacher outputs live on the train pool
        dev = list(jax.tree_util.tree_leaves(tout)[0].devices())
        assert set(dev) <= set(dd.train_mesh.devices.ravel())
        m = dd.step(
            jax.tree_util.tree_map(np.asarray, batch), tout,
            jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_disaggregated_matches_colocated():
    """Same rng + batch: the two-pool path computes the same first-step
    loss as the colocated step."""
    step_fn, state, flux_params, batch = build_tiny_distill(batch_size=4)
    _, metrics_colocated = jax.jit(step_fn)(
        state, flux_params, batch, jax.random.key(7))

    (teacher_fn, student_fn), state2, flux_params2, _ = \
        build_tiny_distill(batch_size=4, split=True)
    dd = DisaggregatedDistill(teacher_fn, student_fn, flux_params2,
                              flux_params2, state2, n_infer_devices=2)
    tout = dd.teacher_step(batch, jax.random.key(7))
    m = dd.step(batch, tout, jax.random.key(7))
    np.testing.assert_allclose(float(m["loss"]),
                               float(metrics_colocated["loss"]), rtol=1e-4)


def test_disaggregated_train_stream():
    (teacher_fn, student_fn), state, flux_params, batch = \
        build_tiny_distill(batch_size=4, split=True)
    dd = DisaggregatedDistill(teacher_fn, student_fn, flux_params,
                              flux_params, state, n_infer_devices=2)
    rngs = (jax.random.key(i) for i in itertools.count())
    stream = dd.train_stream(itertools.repeat(batch, 3), rngs)
    n = 0
    for train_batch, tout in stream:
        m = dd.step(train_batch, tout, jax.random.key(n))
        assert np.isfinite(float(m["loss"]))
        n += 1
    assert n == 3


def test_rejects_degenerate_pools():
    (teacher_fn, student_fn), state, flux_params, _ = \
        build_tiny_distill(batch_size=4, split=True)
    with pytest.raises(ValueError):
        DisaggregatedDistill(teacher_fn, student_fn, flux_params,
                             flux_params, state, n_infer_devices=8)
