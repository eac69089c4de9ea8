from deepfluoro_tpu.ops.pallas.warp import affine_warp_pallas, pallas_warp_supported

__all__ = ["affine_warp_pallas", "pallas_warp_supported"]
