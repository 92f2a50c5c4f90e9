from leetcuda_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, tp_shard_rules, MeshConfig)
from leetcuda_tpu.parallel.ring import (  # noqa: F401
    ring_attention, ulysses_attention)
from leetcuda_tpu.parallel import collectives  # noqa: F401
