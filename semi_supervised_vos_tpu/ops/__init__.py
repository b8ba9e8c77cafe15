from semi_supervised_vos_tpu.ops.resize import nearest_resize  # noqa: F401
from semi_supervised_vos_tpu.ops.onehot import (  # noqa: F401
    index_to_onehot,
    color_to_class,
    davis_centroids,
)
