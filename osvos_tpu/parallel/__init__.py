from osvos_tpu.parallel.mesh import make_mesh  # noqa: F401
from osvos_tpu.parallel.batched_online import batched_fine_tune  # noqa: F401
