from captra_tpu.models.backbone import PointNet2Msg  # noqa: F401
from captra_tpu.models.coordnet import CoordNet  # noqa: F401
from captra_tpu.models.rotnet import RotNet  # noqa: F401
