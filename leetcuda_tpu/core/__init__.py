from leetcuda_tpu.core.runtime import (  # noqa: F401
    cdiv,
    round_up,
    min_tile,
    interpret_default,
    on_tpu,
)
from leetcuda_tpu.core.registry import OPS, get_op, register_op  # noqa: F401
