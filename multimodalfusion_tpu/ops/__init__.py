from multimodalfusion_tpu.ops.mil_attention import (  # noqa: F401
    attention_pool,
    attention_scores,
    masked_softmax_pool,
)
