from diffphycon_tpu.nets.unet2d import UNet2D
from diffphycon_tpu.nets.unet3d import UNet3D
from diffphycon_tpu.nets.unet2dv2 import ForceUNet, UNet2Dv2
