from mst_tpu.train.schedules import warmup_cosine_schedule, cosine_schedule
from mst_tpu.train.stage1 import Stage1State, create_stage1_state, make_train_step, make_eval_step
from mst_tpu.train.style_transfer import (
    StyleTransferState,
    create_style_transfer_state,
    make_style_transfer_step,
    apply_style_transfer,
)

__all__ = [
    "warmup_cosine_schedule",
    "cosine_schedule",
    "Stage1State",
    "create_stage1_state",
    "make_train_step",
    "make_eval_step",
    "StyleTransferState",
    "create_style_transfer_state",
    "make_style_transfer_step",
    "apply_style_transfer",
]
