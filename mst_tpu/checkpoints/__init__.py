from mst_tpu.checkpoints.torch_compat import (
    encoder_params_from_torch,
    tcn_params_from_torch,
    film_generator_params_from_torch,
    discriminator_params_from_torch,
    cqtnet_params_from_torch,
    load_torch_checkpoint,
)
from mst_tpu.checkpoints.torch_export import (
    encoder_params_to_torch,
    tcn_params_to_torch,
    film_generator_params_to_torch,
    save_torch_checkpoint,
)
from mst_tpu.checkpoints.orbax_io import save_checkpoint, restore_checkpoint, latest_step

__all__ = [
    "encoder_params_from_torch",
    "tcn_params_from_torch",
    "film_generator_params_from_torch",
    "discriminator_params_from_torch",
    "cqtnet_params_from_torch",
    "load_torch_checkpoint",
    "encoder_params_to_torch",
    "tcn_params_to_torch",
    "film_generator_params_to_torch",
    "save_torch_checkpoint",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
]
