from thermal3d.preprocess.enhance import (
    enhance_thermal_contrast,
    enhance_thermal_fixed_range,
    rgb_to_gray,
    percentile_rescale,
)
from thermal3d.preprocess.fire_scene import (
    clahe,
    preprocess_fire_scene_thermal,
    advanced_fire_scene_processing,
)
from thermal3d.preprocess.io import load_thermal_image, load_rgb_image, preprocess_thermal_for_model
