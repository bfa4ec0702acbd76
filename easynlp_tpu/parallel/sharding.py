"""Logical-axis sharding rules.

Replaces the reference's Column/RowParallelLinear layers and vocab-parallel
embedding (reference models/mg_glm/mpu_transformer.py:24-35, 154-491): model
code annotates parameters with *logical* axis names; these rules map logical
names to mesh axes, and pjit/XLA inserts the all-reduce/all-gather that the
mpu layers performed by hand.

Logical axes used across the model zoo:
  vocab   — embedding/vocab dimension (TP-sharded → vocab-parallel CE)
  embed   — model/hidden dimension (FSDP-sharded params)
  heads   — attention heads (TP)
  kv      — per-head dim (replicated)
  mlp     — FFN intermediate dimension (TP)
  joined_kv — fused qkv output dim (TP)
  batch   — data batch (DP/FSDP)
  length  — sequence (SP later)
"""

from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec

DEFAULT_RULES = (
    ("layers", None),
    ("batch", ("data", "fsdp")),
    ("length", None),
    ("vocab", "tensor"),
    ("embed", "fsdp"),
    ("embed_out", None),
    ("heads", "tensor"),
    ("kv", None),
    ("joined_kv", "tensor"),
    ("mlp", "tensor"),
    ("classes", None),
    ("stack", None),
    ("expert", "expert"),
)


def filter_rules_for_mesh(mesh, rules=DEFAULT_RULES):
    """Drop rules that refer to axes absent from (or trivial in) the mesh, so
    the same model code runs on 1 chip, a dp-only pod slice, or a dp×tp mesh."""
    out = []
    for logical, physical in rules:
        if physical is None:
            out.append((logical, None))
            continue
        phys = physical if isinstance(physical, (list, tuple)) else (physical,)
        kept = tuple(p for p in phys
                     if p in mesh.axis_names and mesh.shape[p] > 1)
        out.append((logical, kept if kept else None))
    return tuple(out)


def logical_axis_rules(mesh, rules=DEFAULT_RULES):
    """Context manager enabling flax logical-axis resolution for this mesh."""
    return nn.logical_axis_rules(filter_rules_for_mesh(mesh, rules))


def logical_to_sharding(logical_spec, mesh, rules=DEFAULT_RULES):
    """Map a logical PartitionSpec (tuple of logical axis names / None) to a
    NamedSharding on the mesh."""
    with logical_axis_rules(mesh, rules):
        spec = nn.logical_to_mesh_axes(PartitionSpec(*logical_spec))
    return NamedSharding(mesh, spec)


def params_shardings(abstract_params, mesh, rules=DEFAULT_RULES):
    """Given an eval_shape'd variables pytree whose leaves are
    nn.Partitioned boxes (from nn.with_logical_partitioning), return the
    matching NamedSharding pytree."""
    with logical_axis_rules(mesh, rules):
        specs = nn.logical_to_mesh_sharding(
            nn.get_partition_spec(abstract_params), mesh,
            filter_rules_for_mesh(mesh, rules))
    return specs


def unbox(variables):
    """Strip nn.Partitioned metadata boxes, returning raw arrays."""
    return nn.unbox(variables)
