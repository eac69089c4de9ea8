from deepfluoro_tpu.models.unet import UNet, UNetConvBlock, UNetUpBlock

__all__ = ["UNet", "UNetConvBlock", "UNetUpBlock"]
