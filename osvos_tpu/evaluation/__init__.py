from osvos_tpu.evaluation.davis_j import (  # noqa: F401
    boundary_f_measure,
    db_eval_iou,
    evaluate_sequence,
)
from osvos_tpu.evaluation.infer import infer_sequence, save_mask_png  # noqa: F401
