from .evaluation import (
    top_k_leave,
    top_k_leave_mask,
    iou_sim_batch,
    prob_auc_batch,
    main_eval_batch,
    compute_final_result,
    make_results_list,
)
from .checkpoint import CheckPointer

__all__ = [
    "top_k_leave",
    "top_k_leave_mask",
    "iou_sim_batch",
    "prob_auc_batch",
    "main_eval_batch",
    "compute_final_result",
    "make_results_list",
    "CheckPointer",
]
