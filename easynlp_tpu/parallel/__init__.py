from easynlp_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    get_global_mesh,
    set_global_mesh,
    batch_sharding,
    replicated_sharding,
    data_parallel_size,
)
from easynlp_tpu.parallel.sharding import (  # noqa: F401
    DEFAULT_RULES,
    logical_axis_rules,
    logical_to_sharding,
    params_shardings,
    unbox,
)
