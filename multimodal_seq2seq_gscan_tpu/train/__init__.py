from multimodal_seq2seq_gscan_tpu.train.state import (
    TrainState, create_train_state, make_lr_schedule)
from multimodal_seq2seq_gscan_tpu.train.step import (
    make_train_step, make_eval_forward)
