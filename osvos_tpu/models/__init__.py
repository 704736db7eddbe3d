from osvos_tpu.models.vgg_osvos import OSVOS  # noqa: F401
from osvos_tpu.models.surgery import (  # noqa: F401
    init_osvos_params,
    load_torch_state_dict,
)
