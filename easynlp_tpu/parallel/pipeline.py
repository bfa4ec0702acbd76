"""Pipeline parallelism: GPipe-style microbatch schedule over a `stage`
mesh axis.

The reference has NO pipeline parallelism anywhere (SURVEY.md §2.7: its
rapidformer examples defer to the external closed package) — this is a
beyond-reference capability, built the TPU way: no send/recv threads or
schedulers; ONE SPMD program under shard_map where every stage runs the same
code each tick and activations rotate to the next stage with a single
`ppermute`. The whole schedule is differentiable (ppermute has a transpose),
so jax.grad gives 1F1B-equivalent-memory GPipe backward for free, and remat
of stage_fn bounds activation memory.

Layout contract: stage-stacked params — every leaf has leading dim S sharded
over `stage` (logical axis "stack" maps to the mesh's stage axis via
parallel/sharding.py rules when models annotate it; plain device_put with a
leading-dim sharding works too).
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def gpipe(stage_fn, stacked_params, x, mesh, num_microbatches,
          stage_axis="pipeline", batch_axes=("data", "fsdp"),
          param_specs=None):
    """Run x through S pipeline stages: y = f_{S-1}(... f_0(x)).

    stage_fn(params_slab, x_microbatch) -> same-shape activation, where
    params_slab leaves have leading dim layers_per_stage = L / S (stage i
    holds leaf[i*L/S:(i+1)*L/S] — a scanned model's [L, ...] stack pipelines
    directly; for one layer per stage the slab dim is 1).
    stacked_params: pytree, every leaf [L, ...] with L divisible by S.
    x: [B, ...] global batch; B must divide into num_microbatches.
    param_specs: optional pytree of PartitionSpecs (leading axis must be
    the stage axis) for composing tensor parallelism INSIDE a stage —
    leaves sharded over further axes arrive in stage_fn as local shards
    and stage_fn performs its own collectives (all_gather/psum over the
    extra axis), shard_map style. Default: P(stage_axis) on every leaf.
    Returns y [B, ...].

    Schedule: classic GPipe fill+drain — tick t has stage s working on
    microbatch (t - s); M + S - 1 ticks total. Inactive (bubble) ticks
    compute but are masked out, keeping the program SPMD.
    """
    s_count = mesh.shape[stage_axis]
    m_count = int(num_microbatches)

    from easynlp_tpu.parallel.compat import \
        shard_map_compat as shard_map

    batch = tuple(a for a in batch_axes
                  if a in mesh.axis_names and mesh.shape[a] > 1) or None
    # divisibility must hold for the PER-DATA-SHARD batch (the reshape
    # happens inside shard_map on the local rows), not the global one
    dp = 1
    for a in (batch or ()):
        dp *= mesh.shape[a]
    if x.shape[0] % dp or (x.shape[0] // dp) % m_count:
        raise ValueError(
            "batch %d must divide by data shards %d and then by "
            "num_microbatches %d" % (x.shape[0], dp, m_count))

    def inner(params_local, x_local):
        # params_local leaves keep their leading dim = layers-per-stage
        # (total leading dim / S) — scanned models' [L, ...] stacks pipeline
        # directly; stage_fn receives the local slab
        params_one = params_local
        stage_id = jax.lax.axis_index(stage_axis)
        mb = x_local.shape[0] // m_count
        xs = x_local.reshape((m_count, mb) + x_local.shape[1:])
        state = jnp.zeros_like(xs[0])
        outputs = jnp.zeros_like(xs)
        fwd = [(i, (i + 1) % s_count) for i in range(s_count)]

        def tick(carry, t):
            # one traced copy of stage_fn for the whole schedule: program
            # size / compile time stay O(1) in the microbatch count instead
            # of O(M + S) from an unrolled Python loop (x2 for backward)
            state, outputs = carry
            m_in = t - stage_id            # microbatch this stage works on
            active = (m_in >= 0) & (m_in < m_count)
            # stage 0 injects a fresh microbatch; others take the rotated
            # activation from the previous stage
            feed = xs[jnp.clip(t, 0, m_count - 1)]
            x_in = jnp.where(stage_id == 0, feed, state)
            y = stage_fn(params_one, x_in)
            y = jnp.where(active, y, jnp.zeros_like(y))
            # last stage banks its finished microbatch
            done = (stage_id == s_count - 1) & active
            slot = jax.nn.one_hot(jnp.clip(m_in, 0, m_count - 1), m_count,
                                  dtype=y.dtype)
            outputs = outputs + jnp.where(done, 1.0, 0.0) * (
                slot.reshape((m_count,) + (1,) * y.ndim) * y[None])
            # rotate activations one stage forward
            state = jax.lax.ppermute(y, stage_axis, fwd)
            return (state, outputs), None

        (state, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(m_count + s_count - 1))

        # only the last stage holds real outputs; broadcast over the axis
        outputs = jax.lax.psum(outputs, stage_axis)
        return outputs.reshape(x_local.shape)

    if param_specs is None:
        param_specs = jax.tree.map(
            lambda _: P(stage_axis), stacked_params)
    wrapped = shard_map(
        inner, mesh=mesh,
        in_specs=(param_specs, P(batch)),
        out_specs=P(batch), check=False)
    return wrapped(stacked_params, x)


def place_stage_stacked(stacked_params, mesh, stage_axis="pipeline"):
    """Shard every leaf's leading (stage) dim over the stage axis."""
    sh = NamedSharding(mesh, P(stage_axis))
    return jax.tree.map(lambda p: jax.device_put(p, sh), stacked_params)
