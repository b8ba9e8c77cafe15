from semi_supervised_vos_tpu.models.resnet import (  # noqa: F401
    ResNetBackbone,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
)
from semi_supervised_vos_tpu.models.vos_net import VOSNet  # noqa: F401
from semi_supervised_vos_tpu.models.convert import (  # noqa: F401
    load_torch_checkpoint,
    convert_vosnet_state_dict,
)
