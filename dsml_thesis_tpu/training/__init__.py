from .ema import ema_update
from .lr_scheduler import (
    warmup_cosine,
    warmup_cosine2,
    lambda_linear,
    build_lr_multiplier,
)
from .train_state import (
    TrainState,
    make_optimizer,
    create_train_state,
    make_train_step,
    make_eval_step,
)
