from semi_supervised_vos_tpu.train.losses import (  # noqa: F401
    cross_entropy_loss,
    contrastive_loss,
    focal_loss,
    triplet_loss_with_miner,
)
