from recnext_tpu.ops.resize import resize, resize_bilinear, resize_nearest  # noqa: F401
from recnext_tpu.ops.conv import conv2d, depthwise_conv2d  # noqa: F401
from recnext_tpu.ops.recconv import rec_conv2d  # noqa: F401
from recnext_tpu.ops.attention import (  # noqa: F401
    linear_attention_kv_first,
    linear_attention_qk_first,
)
