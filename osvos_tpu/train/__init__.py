from osvos_tpu.train.optim import make_osvos_optimizer, param_group_label  # noqa: F401
