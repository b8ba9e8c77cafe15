from semi_supervised_vos_tpu.eval.metrics import (  # noqa: F401
    evaluate_segmentation,
    eval_j,
    eval_f,
)
from semi_supervised_vos_tpu.eval.evaluation import evaluation_command_impl  # noqa: F401
