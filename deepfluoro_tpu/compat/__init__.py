from deepfluoro_tpu.compat.torch_import import import_torch_checkpoint

__all__ = ["import_torch_checkpoint"]
