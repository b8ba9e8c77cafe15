from semi_supervised_vos_tpu.core.sampling import (  # noqa: F401
    sample_frames_host,
    sample_frames,
)
from semi_supervised_vos_tpu.core.spatial import (  # noqa: F401
    spatial_weight,
    spatial_coords,
)
from semi_supervised_vos_tpu.core.propagation import (  # noqa: F401
    affinity_propagate,
    batch_similarity,
    batch_predict,
)
