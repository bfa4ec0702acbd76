"""jax version compatibility shims for the parallel substrate."""


def shard_map_compat(f, mesh, in_specs, out_specs, check=False):
    """shard_map across jax versions: jax>=0.8 promotes it to jax.shard_map
    and renames check_rep→check_vma; older jax has the experimental path."""
    try:
        from jax import shard_map
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=check)
    except ImportError:
        from jax.experimental.shard_map import shard_map
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=check)
