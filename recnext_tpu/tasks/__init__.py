from recnext_tpu.tasks.fpn import FPN  # noqa: F401
from recnext_tpu.tasks.segmentation import SemanticFPN, segmentation_loss, miou  # noqa: F401
from recnext_tpu.tasks.detection import (  # noqa: F401
    DetectionBackbone,
    RetinaNet,
    init_backbone_from_classification,
)
from recnext_tpu.tasks.mask_rcnn import MaskRCNN, mask_rcnn_loss  # noqa: F401
