from smirk_tpu.losses.losses import (  # noqa: F401
    landmark_mse,
    masked_landmark_mse,
    param_regularization,
)
