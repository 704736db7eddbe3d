from osvos_tpu.data.davis import DAVIS2016  # noqa: F401
from osvos_tpu.data.transforms import (  # noqa: F401
    Compose,
    RandomHorizontalFlip,
    Resize,
    ScaleNRotate,
    ToArray,
)
