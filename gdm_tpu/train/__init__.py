"""Training layer: schedules, train state, jitted sharded train step,
checkpointing (reference train_lm.py/train_ycb.py Trainer)."""

from gdm_tpu.train.schedules import cyclic_lr, bn_momentum_schedule
from gdm_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
)
from gdm_tpu.train.step import make_train_step, make_eval_step
from gdm_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from gdm_tpu.train.import_torch import (
    export_state_dict,
    import_state_dict,
    load_torch_reference_checkpoint,
)
