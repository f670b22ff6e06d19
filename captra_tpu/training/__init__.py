from captra_tpu.training.trainer import (  # noqa: F401
    TrainState,
    Trainer,
    bn_momentum_for_epoch,
    coordnet_loss,
    make_lr_schedule,
    make_optimizer,
    rotnet_loss,
)
