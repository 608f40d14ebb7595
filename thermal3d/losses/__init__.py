from thermal3d.losses.losses import (
    confidence_weighted_regression_loss,
    thermal_aware_loss,
    enhanced_thermal_aware_loss,
    batched_enhanced_loss,
)
