from smirk_tpu.train.trainer import SmirkSystem, TrainState  # noqa: F401
