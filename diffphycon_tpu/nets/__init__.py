from diffphycon_tpu.nets.unet2d import UNet2D
