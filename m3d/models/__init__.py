from m3d.models.backbone import ResNet3D  # noqa: F401
from m3d.models.fpn import FPN3D  # noqa: F401
from m3d.models.rpn_head import RPNHead  # noqa: F401
from m3d.models.heads import ClassifierHead, MaskHead  # noqa: F401
from m3d.models.mask_rcnn import MaskRCNN  # noqa: F401
