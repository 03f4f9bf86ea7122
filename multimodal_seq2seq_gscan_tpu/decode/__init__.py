from multimodal_seq2seq_gscan_tpu.decode.greedy import (
    GreedyDecodeOutput, make_greedy_decoder, strip_output_sequences)
