from semi_supervised_vos_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
)
from semi_supervised_vos_tpu.parallel.sharded_affinity import (  # noqa: F401
    sharded_affinity_propagate,
)
from semi_supervised_vos_tpu.parallel import collectives  # noqa: F401
