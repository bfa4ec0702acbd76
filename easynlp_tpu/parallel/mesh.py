"""Device mesh construction.

Replaces the reference's process-group initialisation (reference
easynlp/utils/initializer.py:98-144 NCCL/Gloo + tcp:// rendezvous and
mg_utils/pretrain_glm.py:225-244 mpu.initialize_model_parallel): on TPU the
whole parallelism story — DP, FSDP/ZeRO, TP, (SP/EP later) — is one
`jax.sharding.Mesh` with named axes, and XLA inserts the collectives.
"""

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec

_GLOBAL_MESH = None

# Canonical axis order: outer→inner. Inner axes land on the fastest ICI links,
# so tensor (highest collective frequency) goes last.
AXIS_ORDER = ("pipeline", "data", "fsdp", "expert", "sequence", "tensor")


def build_mesh(axis_sizes=None, devices=None):
    """Build a Mesh from {axis: size}. Axes of size 1 are kept (harmless and
    make PartitionSpecs uniform). Axis order follows AXIS_ORDER for any known
    axes, then spec order for custom ones."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"data": n}
    known = [a for a in AXIS_ORDER if a in axis_sizes]
    custom = [a for a in axis_sizes if a not in AXIS_ORDER]
    names = tuple(known + custom)
    shape = tuple(axis_sizes[a] for a in names)
    total = int(np.prod(shape))
    if total != n:
        raise ValueError("mesh %r needs %d devices, have %d" % (axis_sizes, total, n))
    try:
        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except (ValueError, AssertionError):
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def set_global_mesh(mesh):
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh
    return mesh


def get_global_mesh():
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = build_mesh()
    return _GLOBAL_MESH


def mesh_axis_size(mesh, name):
    return mesh.shape[name] if name in mesh.axis_names else 1


def data_parallel_size(mesh=None):
    mesh = mesh or get_global_mesh()
    return mesh_axis_size(mesh, "data") * mesh_axis_size(mesh, "fsdp")


def batch_sharding(mesh=None):
    """Sharding for host-fed batches: leading axis over (data, fsdp)."""
    mesh = mesh or get_global_mesh()
    axes = tuple(a for a in ("data", "fsdp") if a in mesh.axis_names
                 and mesh.shape[a] > 1) or None
    return NamedSharding(mesh, PartitionSpec(axes))


def replicated_sharding(mesh=None):
    mesh = mesh or get_global_mesh()
    return NamedSharding(mesh, PartitionSpec())
