from thermal3d.core.config import (
    DustrModelConfig,
    HeadConfig,
    PreprocessConfig,
    LossConfig,
    TrainConfig,
    DUSTR_224_LINEAR,
    MASTR_512_CATMLPDPT,
    FREIBURG_RAW_MIN,
    FREIBURG_RAW_MAX,
)
from thermal3d.core.mesh import make_mesh, data_sharding, replicated_sharding
