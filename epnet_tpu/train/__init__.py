from .loss import joint_loss, rcnn_loss, rpn_loss
from .optimizer import make_optimizer
from .schedules import bn_momentum_at, decay_lr_by_epoch, one_cycle_lr, one_cycle_mom
from .trainer import (
    TrainState,
    Trainer,
    create_train_state,
    jit_train_step,
    load_checkpoint,
    make_train_step,
    restore_partial,
    save_checkpoint,
)

__all__ = [
    'TrainState', 'Trainer', 'bn_momentum_at', 'create_train_state',
    'decay_lr_by_epoch', 'jit_train_step', 'joint_loss', 'load_checkpoint',
    'make_optimizer', 'make_train_step', 'one_cycle_lr', 'one_cycle_mom',
    'rcnn_loss', 'restore_partial', 'rpn_loss', 'save_checkpoint',
]
