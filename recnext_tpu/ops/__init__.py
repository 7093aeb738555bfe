from recnext_tpu.ops.resize import (  # noqa: F401
    resize,
    resize_bilinear,
    resize_matmul,
    resize_nearest,
)
from recnext_tpu.ops.conv import conv2d, depthwise_conv2d, depthwise_conv2d_taps  # noqa: F401
from recnext_tpu.ops.recconv import (  # noqa: F401
    rec_conv2d,
    rec_conv2d_channel_split,
    rec_conv2d_transpose_up,
)
from recnext_tpu.ops.attention import (  # noqa: F401
    feature_map,
    linear_attention_kv_first,
    linear_attention_qk_first,
    softmax_attention,
)
