from thermal3d.convert.torch_to_flax import (
    convert_state_dict,
    load_torch_checkpoint,
    convert_checkpoint,
    expected_torch_keys,
)
