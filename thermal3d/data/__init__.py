from thermal3d.data.freiburg import (
    build_pair_index,
    build_rgb_pair_index,
    build_rgb_thermal_index,
    match_pseudo_gt,
    validate_pair_index,
    FreiburgPairDataset,
    day_night_filter,
)
from thermal3d.data.pipeline import BatchLoader, split_index
