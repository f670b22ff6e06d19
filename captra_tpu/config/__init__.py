from captra_tpu.config.schema import (  # noqa: F401
    Config,
    NetworkCfg,
    ObjCfg,
    PerturbCfg,
    PointNetCfg,
    SAMsgCfg,
    TrackCfg,
    OptimCfg,
)
from captra_tpu.config.loader import get_config, load_obj_config  # noqa: F401
