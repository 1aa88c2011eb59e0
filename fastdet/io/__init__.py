from fastdet.io.checkpoint import save_checkpoint, load_checkpoint, latest_step
from fastdet.io.torch_convert import convert_torch_checkpoint, load_torch_weights

__all__ = [
    "save_checkpoint", "load_checkpoint", "latest_step",
    "convert_torch_checkpoint", "load_torch_weights",
]
from fastdet.io.weights import load_variables, merge_variables  # noqa: E402

__all__ += ["load_variables", "merge_variables"]
