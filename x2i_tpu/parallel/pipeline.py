"""GPipe-style pipeline parallelism over a mesh axis.

The reference has no pipeline parallelism (SURVEY §2.6: DP + ZeRO-2
only); this is the TPU-native pp layer for stacks too deep/large to
replicate: the scan-over-layers parameter stacks that every x2i_tpu
model uses shard naturally on their leading (layer) axis, so each
device on the 'stage' mesh axis holds a contiguous chunk of layers and
microbatches stream through the ring — activations hop stage→stage via
ppermute while every stage computes a different microbatch (the classic
schedule: M + S - 1 steps, bubble fraction (S-1)/(M+S-1)).

Design notes (TPU/XLA):
- SPMD-friendly: every device runs the SAME program every step; stage
  identity comes from lax.axis_index. Bubble steps compute garbage that
  is never selected — branchless, so XLA keeps one fused loop body.
- The time loop is a lax.fori_loop (compiled once, not unrolled);
  microbatch i/o via dynamic_slice / dynamic_update_slice on a
  stacked (M, ...) buffer.
- The final psum broadcasts the last stage's output buffer (zeros
  elsewhere) so callers see the result replicated across stages.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _tree_dynamic_index(tree, i):
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, keepdims=False), tree)


def _tree_dynamic_update(tree, upd, i):
    return jax.tree.map(
        lambda a, u: jax.lax.dynamic_update_index_in_dim(a, u, i, 0),
        tree, upd)


def _tree_select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def pipeline_scan(stage_fn: Callable[[Any, Any], Any],
                  stage_params: Any,
                  xs: Any,
                  *,
                  axis_name: str,
                  n_stages: int):
    """Run microbatches through a layer pipeline — call INSIDE shard_map.

    Args:
      stage_fn: (stage_params, activation) -> activation. Applies this
        device's chunk of layers (e.g. an inner lax.scan over the local
        (L/S, ...) parameter stack). Activation may be any pytree whose
        leaves all have the microbatch shape.
      stage_params: this device's layer-chunk parameters (shard the
        stacked (L, ...) tree over `axis_name` dim 0 in shard_map
        in_specs).
      xs: (M, ...) stacked microbatch activations (replicated across the
        stage axis; only stage 0 reads them).
      axis_name: mesh axis the stages live on.
      n_stages: static stage count (mesh.shape[axis_name]).

    Returns:
      (M, ...) outputs, replicated across the stage axis.
    """
    stage = jax.lax.axis_index(axis_name)
    n_micro = jax.tree.leaves(xs)[0].shape[0]
    steps = n_micro + n_stages - 1

    def _varying(tree):
        # the loop carry becomes stage-varying on the first write; the
        # zero-init must carry the same varying-manual-axes type
        return jax.tree.map(
            lambda a: jax.lax.pcast(a, (axis_name,), to="varying"), tree)

    zero = _varying(jax.tree.map(lambda a: jnp.zeros_like(a[0]), xs))
    outs0 = _varying(jax.tree.map(jnp.zeros_like, xs))
    fwd = [(i, i + 1) for i in range(n_stages - 1)]      # last stage drops

    def step(t, carry):
        recv, outs = carry
        # stage 0 feeds microbatch t (clamped; bubbles select garbage
        # that is never written), later stages consume the hop
        mb = jnp.clip(t, 0, n_micro - 1)
        inp = _tree_select(stage == 0, _tree_dynamic_index(xs, mb), recv)
        out = stage_fn(stage_params, inp)
        # the last stage finishes microbatch t - (S-1) at step t
        done = t - (n_stages - 1)
        write = jnp.logical_and(stage == n_stages - 1,
                                jnp.logical_and(done >= 0, done < n_micro))
        upd = _tree_select(write, out, _tree_dynamic_index(
            outs, jnp.clip(done, 0, n_micro - 1)))
        outs = _tree_dynamic_update(outs, upd, jnp.clip(done, 0,
                                                        n_micro - 1))
        recv = (jax.lax.ppermute(out, axis_name, fwd)
                if n_stages > 1 else out)
        return recv, outs

    _, outs = jax.lax.fori_loop(0, steps, step, (zero, outs0))
    # broadcast the last stage's buffer to every stage
    mask = (stage == n_stages - 1).astype(jnp.float32)
    return jax.tree.map(
        lambda a: (jax.lax.psum(a.astype(jnp.float32) * mask, axis_name)
                   ).astype(a.dtype), outs)


def pipeline_apply(stage_fn: Callable[[Any, Any], Any],
                   stacked_params: Any,
                   xs: Any,
                   *,
                   axis_name: str,
                   n_stages: int):
    """Global-array entry under an ambient mesh (jax.set_mesh): shards
    the leading layer axis of `stacked_params` into n_stages chunks over
    `axis_name`, replicates the (M, ...) microbatch stack, and runs the
    pipeline. stage_fn sees the LOCAL (L/S, ...) chunk."""
    from jax.sharding import PartitionSpec as P

    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"pipeline_apply: {n_layers} layers not divisible "
                         f"by {n_stages} stages")
    pspec = jax.tree.map(lambda _: P(axis_name), stacked_params)
    xspec = jax.tree.map(lambda _: P(), xs)

    def body(params_local, xs_local):
        return pipeline_scan(stage_fn, params_local, xs_local,
                             axis_name=axis_name, n_stages=n_stages)

    return jax.shard_map(body, in_specs=(pspec, xspec),
                         out_specs=jax.tree.map(lambda _: P(), xs))(
                             stacked_params, xs)
