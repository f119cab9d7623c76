from genpercept_tpu.io.weights import (
    convert_torch_state_dict,
    load_safetensors,
    unflatten_dict,
)

__all__ = ["convert_torch_state_dict", "load_safetensors", "unflatten_dict"]
