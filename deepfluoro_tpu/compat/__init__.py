from deepfluoro_tpu.compat.torch_import import (
    export_torch_checkpoint,
    import_torch_checkpoint,
    torch_checkpoint_to_native,
)

__all__ = [
    "export_torch_checkpoint",
    "import_torch_checkpoint",
    "torch_checkpoint_to_native",
]
