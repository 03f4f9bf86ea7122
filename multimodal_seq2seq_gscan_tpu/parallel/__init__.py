from multimodal_seq2seq_gscan_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate)
