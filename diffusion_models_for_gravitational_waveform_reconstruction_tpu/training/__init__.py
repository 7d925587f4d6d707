from .train import (  # noqa: F401
    TrainConfig,
    TrainState,
    build_model_and_state,
    checkpoint_args,
    make_lr_schedule,
    make_optimizer,
    make_probe_fn,
    make_train_step,
    prepare_output_dir,
    train,
)
