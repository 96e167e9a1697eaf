from m3d.ops.nms3d import nms_3d  # noqa: F401
from m3d.ops.roialign3d import crop_and_resize_3d, pyramid_roi_align  # noqa: F401
