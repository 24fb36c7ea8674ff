from dh3d_tpu.train.trainer import (  # noqa: F401
    TrainState,
    init_state,
    kernel_l2,
    load_checkpoint,
    lr_schedule,
    make_eval_step,
    make_optimizer,
    make_train_step,
    param_labels,
    restore_state,
    save_checkpoint,
    smart_init,
)
