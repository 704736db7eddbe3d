from osvos_tpu.ops.crop import center_crop  # noqa: F401
from osvos_tpu.ops.loss import (  # noqa: F401
    class_balanced_cross_entropy_loss,
    class_balanced_cross_entropy_loss_per_sample,
    class_balanced_cross_entropy_loss_theoretical,
)
from osvos_tpu.ops.pool import max_pool_ceil  # noqa: F401
from osvos_tpu.ops.upsample import (  # noqa: F401
    bilinear_filter,
    bilinear_upsample,
    interp_surgery_weights,
)
