from thermal3d.models.dustr import AsymmetricCroCo3DStereo
from thermal3d.models.thermal_wrap import ThermalDUSt3R, ThermalPreprocessHead
from thermal3d.models.rope import make_grid_positions, apply_rope_2d
