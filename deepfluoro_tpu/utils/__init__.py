from deepfluoro_tpu.utils.io import (
    RunningFloatWriter,
    read_floats_from_txt,
    write_floats_to_txt,
)

__all__ = ["RunningFloatWriter", "read_floats_from_txt", "write_floats_to_txt"]
