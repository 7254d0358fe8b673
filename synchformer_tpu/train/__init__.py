from synchformer_tpu.train.state import (  # noqa: F401
    SyncTrainState,
    make_lr_schedule,
    make_optimizer,
    split_params,
)
from synchformer_tpu.train.step import make_sync_train_step, make_sync_eval_step  # noqa: F401
