from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig
from multimodal_seq2seq_gscan_tpu.models.params import (
    ModelParams, init_model_params)
from multimodal_seq2seq_gscan_tpu.models.model import (
    encode_input, decode_teacher_forced, forward, get_loss, get_metrics,
    get_auxiliary_loss, get_auxiliary_accuracy, auxiliary_task_forward,
    count_parameters)
