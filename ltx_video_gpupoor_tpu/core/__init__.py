from .dtypes import DEFAULT_POLICY, FP32_POLICY, DtypePolicy, policy_for
from .mesh import (
    AXIS_NAMES,
    DATA_AXIS,
    SEQUENCE_AXIS,
    TENSOR_AXIS,
    MeshConfig,
    make_mesh,
    mesh_from_env,
    parse_mesh_spec,
    replicated,
    shard,
    single_device_mesh,
)
from .params import (
    Params,
    cast_params,
    flatten,
    param_bytes,
    param_count,
    unflatten,
)
from .rng import seed_everything, split_for
