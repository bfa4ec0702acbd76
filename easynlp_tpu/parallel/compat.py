"""jax version compatibility shims for the parallel substrate."""


def shard_map_compat(f, mesh, in_specs, out_specs, check=False):
    """shard_map across jax versions: jax>=0.8 promotes it to jax.shard_map
    and renames check_rep→check_vma; older jax has the experimental path."""
    import inspect
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    # inspect, don't guess: transition releases promoted jax.shard_map while
    # it still took check_rep, so keying the kwarg off the import path alone
    # would TypeError there
    params = inspect.signature(shard_map).parameters
    kw = {"check_vma" if "check_vma" in params else "check_rep": check}
    return shard_map(f, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, **kw)
